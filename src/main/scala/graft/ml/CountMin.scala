package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a string column: a d×w integer matrix whose cell
  * (i, h_i(x)) accumulates every occurrence of x — estimates are
  * min_i cell(i, h_i(x)), always ≥ the true count, and ≤ true + ε·N with
  * probability 1−δ (ε = e/w, δ = e^−d). The streaming-scale heavy-hitter
  * primitive: the sketch is a few KB however large the stream.
  *
  * Build is one distributed aggregation (explode d rows per occurrence,
  * (row, col)-keyed sum); only the finished d·w cells return to the
  * driver — bounded sketch state, like every collect in this codebase.
  * Hashes mirror [[graft.sources.Bloom]]'s discipline: md5-prefix digest
  * folded to 31 bits, then small-constant affine rows. Worst-case
  * intermediate is digest31 (< 2³¹) × max(A) ≈ 7.0e18 — under the signed
  * 2⁶³−1 ≈ 9.2e18 ceiling with ~24% headroom, so ANSI-overflow-safe and
  * engine-portable, but enlarging the affine constants past 32 bits
  * WOULD overflow: keep A/B at 31-32 bits.
  */
object CountMin {

  /** Affine row constants (31-bit primes). */
  private val A = Array(2654435761L, 2246822519L, 1181783497L, 3266489917L)
  private val B = Array(1013904223L, 1664525L, 69069L, 362437L)

  /** Number of hash rows d. */
  val Depth: Int = 4

  /** 31-bit fold of the portable md5-prefix digest of a string. */
  private def digest31(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(1L << 31))

  /** Column position of hash row i in a width-`w` sketch. */
  private def pos(c: Column, i: Int, w: Int): Column =
    pmod(digest31(c) * lit(A(i)) + lit(B(i)), lit(w.toLong))

  /** Build the sketch over `col` of `df` (one row per occurrence).
    * Returns the d×w cell matrix. */
  def build(df: DataFrame, c: Column, width: Int): Array[Array[Long]] = {
    val cells = df.select(
      explode(array((0 until Depth).map { i =>
        struct(lit(i).as("r"), pos(c, i, width).cast("int").as("col"))
      }: _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.col").as("col"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val m = Array.fill(Depth, width)(0L)
    cells.foreach(row => m(row.getInt(0))(row.getInt(1)) = row.getLong(2))
    m
  }

  /** Point-estimate column: min over rows of the literal sketch cells —
    * pure codegen'd builtins (md5/conv/pmod/element_at/least), usable in
    * any projection without touching the sketch's source data. */
  def estimate(c: Column, sketch: Array[Array[Long]]): Column = {
    val w = sketch(0).length
    least((0 until Depth).map { i =>
      element_at(typedLit(sketch(i).toSeq), pos(c, i, w).cast("int") + 1)
    }: _*)
  }
}
