package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a string column: a d×w integer matrix whose cell
  * (i, h_i(x)) accumulates every occurrence of x — estimates are
  * min_i cell(i, h_i(x)), always ≥ the true count, and ≤ true + ε·N with
  * probability 1−δ (ε = e/w, δ = e^−d). The streaming-scale heavy-hitter
  * primitive: the sketch is a few KB however large the stream.
  *
  * Build is two hash aggregations: occurrences pre-aggregate to one count
  * per DISTINCT 31-bit digest first (map-side combine does most of the
  * work), then d rows per distinct digest sum into the (row, col) cells —
  * so the d-way explode runs over the vocabulary, not the occurrence
  * stream. Only the finished d·w cells return to the driver — bounded
  * sketch state, like every collect in this codebase.
  *
  * Hashing: ONE `xxhash64` evaluation per value folded to 31 bits, then
  * small-constant affine rows derive the d positions from that single
  * digest. xxhash64 is a codegen'd single-pass integer hash — round 7
  * measured the previous md5-hex→conv spelling (d separate cryptographic
  * hashes + base-16 string parses PER VALUE) at 16.7 s for the
  * heavy-hitter query under the driver bench; the sketch is
  * engine-internal (its gate's oracle is the plain exact HAVING query),
  * so nothing requires a DuckDB-portable hash. Worst-case intermediate is
  * digest31 (< 2³¹) × max(A) ≈ 7.0e18 — under the signed 2⁶³−1 ≈ 9.2e18
  * ceiling with ~24% headroom, so ANSI-overflow-safe, but enlarging the
  * affine constants past 32 bits WOULD overflow: keep A/B at 31-32 bits.
  */
object CountMin {

  /** Affine row constants (31-32 bit primes). */
  private val A = Array(2654435761L, 2246822519L, 1181783497L, 3266489917L)
  private val B = Array(1013904223L, 1664525L, 69069L, 362437L)

  /** Number of hash rows d. */
  val Depth: Int = 4

  /** 31-bit fold of one xxhash64 digest of the value — compute this ONCE
    * per row (project it to a column) and feed [[estimateFromDigest]]; the
    * d per-row positions are affine transforms of this single digest. */
  def digest31(c: Column): Column =
    pmod(xxhash64(c), lit(1L << 31))

  /** Column position of hash row i in a width-`w` sketch. */
  private def pos(dig: Column, i: Int, w: Int): Column =
    pmod(dig * lit(A(i)) + lit(B(i)), lit(w.toLong))

  /** Build the sketch over `col` of `df` (one row per occurrence).
    * Returns the d×w cell matrix. */
  def build(df: DataFrame, c: Column, width: Int): Array[Array[Long]] = {
    val perDigest = df.select(digest31(c).as("dig"))
      .groupBy(col("dig")).agg(count(lit(1)).as("n"))
    val cells = perDigest.select(col("n"),
      explode(array((0 until Depth).map { i =>
        struct(lit(i).as("r"), pos(col("dig"), i, width).cast("int").as("col"))
      }: _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.col").as("col"))
      .agg(sum(col("n")).as("n"))
      .collect()
    val m = Array.fill(Depth, width)(0L)
    cells.foreach(row => m(row.getInt(0))(row.getInt(1)) = row.getLong(2))
    m
  }

  /** Point-estimate from an already-projected [[digest31]] column: min
    * over rows of the literal sketch cells — pure codegen'd builtins
    * (pmod/element_at/least) over the one shared digest. */
  def estimateFromDigest(dig: Column, sketch: Array[Array[Long]]): Column = {
    val w = sketch(0).length
    least((0 until Depth).map { i =>
      element_at(typedLit(sketch(i).toSeq), pos(dig, i, w).cast("int") + 1)
    }: _*)
  }

  /** Point-estimate straight from the value column (re-derives the digest
    * inline; prefer projecting [[digest31]] once when the estimate sits in
    * a hot per-occurrence filter). */
  def estimate(c: Column, sketch: Array[Array[Long]]): Column =
    estimateFromDigest(digest31(c), sketch)
}
