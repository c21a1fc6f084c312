package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning (builder brief: "minimize shuffles").
  * When the probe side is corpus-scale and the build side's keys fit a
  * few KB of bitmap, shipping a Bloom filter to the probe scan prunes
  * most non-matching rows BEFORE they reach the join shuffle — the same
  * runtime-filter idea Spark's AQE applies to sort-merge joins, here made
  * explicit so it also covers plans AQE doesn't rewrite (and so the
  * selectivity is observable).
  *
  * The filter is an approximation with no false negatives, so callers
  * keep the exact join afterwards for correctness; the bitmap only cuts
  * the probe volume. Hashes are `xxhash64` folded to 31 bits, then a
  * small-constant affine family (same discipline as [[graft.ml.Dedup]]'s
  * MinHash) — worst-case intermediate is (2³¹−1) × max(A) ≈ 5.7e18, under
  * the signed 2⁶³−1 ≈ 9.2e18 ceiling with ~38% headroom, so the
  * arithmetic is ANSI-overflow-safe and deterministic on any
  * partitioning; enlarging the affine constants past 32 bits WOULD
  * overflow — keep A/B at 31-32 bits.
  */
object Bloom {

  /** Affine constants (31-bit primes): k independent hashes per key. */
  private val A = Array(2654435761L, 2246822519L, 1181783497L)
  private val B = Array(1013904223L, 1664525L, 69069L)

  /** Number of hash functions. */
  val K: Int = 3

  /** Bit position of hash i for a key in a table of `words` longs. */
  private def pos(key: Column, i: Int, words: Int): Column = {
    val h0 = pmod(xxhash64(key), lit(1L << 31))
    pmod(h0 * lit(A(i)) + lit(B(i)), lit(words.toLong * 64))
  }

  /** Build a Bloom bitmap over `keyCol` of `build` with `words` × 64 bits.
    * Distributed bit-set: each key emits K (word, mask) pairs, a word-keyed
    * `bit_or` folds them, and only the finished bitmap (8·`words` bytes —
    * bounded model state, like every collect in this codebase) comes back
    * to the driver. */
  def buildBitmap(build: DataFrame, keyCol: Column, words: Int): Array[Long] = {
    val entries = build.select(
      explode(array((0 until K).map { i =>
        val p = pos(keyCol, i, words)
        struct((p / 64).cast("int").as("w"),
          call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int")).as("m"))
      }: _*)).as("e"))
      .groupBy(col("e.w").as("w")).agg(bit_or(col("e.m")).as("m"))
      .collect()
    val bitmap = new Array[Long](words)
    entries.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    bitmap
  }

  /** Membership test column: true iff all K bits for `keyCol` are set in
    * `bitmap` (passed as a literal array — a few KB serialized into the
    * plan, shipped once with the task binary). Pure codegen'd builtins
    * (hash/pmod/shift/and/element_at), so the probe filter rides
    * whole-stage codegen ahead of the join shuffle. */
  def mightContain(keyCol: Column, bitmap: Array[Long]): Column = {
    val words = bitmap.length
    val arr = typedLit(bitmap.toSeq)
    (0 until K).map { i =>
      val p = pos(keyCol, i, words)
      (call_function("shiftright", element_at(arr, (p / 64).cast("int") + 1),
        pmod(p, lit(64L)).cast("int")).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
  }

  /** Exact semi-join accelerated by a Bloom prefilter on the probe side. */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, words: Int = 256): DataFrame = {
    val bitmap = buildBitmap(build, col(buildKey), words)
    probe.where(mightContain(col(probeKey), bitmap))
      .join(build.select(col(buildKey).as(probeKey)).distinct()
        .hint("broadcast"), Seq(probeKey), "left_semi")
  }
}
