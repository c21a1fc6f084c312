package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering. Sorting a
  * fact table by the bit-interleaving of two filter columns makes each
  * file/row-group's min-max envelope tight in BOTH dimensions, so a
  * two-dimensional box predicate prunes most blocks at the scan — the
  * standard layout trick (Delta/Iceberg `ZORDER BY`) for the 100 TB case
  * where queries filter on two keys but the table can only be sorted once.
  *
  * The z-value is pure integer bit-arithmetic (shift/and/multiply-by-4^i),
  * codegen-friendly and exactly mirrorable in any engine's SQL.
  */
object Layout {

  /** Morton z-value interleaving the low `bits` of `x` and `y`
    * (x in even positions, y in odd). `bits` ≤ 31 keeps every term and the
    * sum far below 2^63 (the result is < 4^bits). */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val pow4 = lit(1L << (2 * i))
      (call_function("shiftright", x, lit(i)).bitwiseAND(lit(1L))) * pow4 +
        (call_function("shiftright", y, lit(i)).bitwiseAND(lit(1L))) * pow4 * lit(2L)
    }.reduce(_ + _)

  /** The same z-value as engine-neutral SQL text (for oracles/other
    * engines): a sum of shift-and-mask terms. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << (2 * i)
      s"(($x >> $i) & 1) * $p + (($y >> $i) & 1) * ${p * 2}"
    }.mkString(" + ")

  /** Range-cluster `df` by the z-value of two columns: range-partition on
    * z then sort within partitions — each output block's (x, y) envelope
    * becomes a small quad of the plane instead of a full-width stripe.
    *
    * Each column is first NORMALIZED to the common `bits`-wide range via
    * its min/max (one cheap aggregation; two longs back to the driver) —
    * without this, the wider-ranged column owns all the high interleave
    * bits and the layout degenerates to a 1-d sort on it (the reason
    * production z-order implementations interleave per-column range-ids,
    * not raw values). */
  /** Accepted input range: each column's span (max − min) must fit in a
    * signed 64-bit long (always true unless the column mixes values near
    * both Long.MinValue and Long.MaxValue). The range-id arithmetic is
    * EXACT INTEGER on both branches: narrow spans (≤ 2^bits) scale UP with
    * a product bounded by span·scale < 2⁶² before an integer DIV; wide
    * spans (e.g. epoch-millis) DIVIDE by a bucket width FIRST and never
    * multiply — the former `(col−lo)·scale/span` spelling both overflowed
    * the multiply past span > 2⁶³/scale and lost exactness to the
    * double-promoting `/` past 2⁵³. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numRanges: Int): DataFrame = {
    require(bits <= 31, s"bits=$bits: z-interleave supports at most 31 bits/dim")
    val r = df.agg(min(col(xCol)), max(col(xCol)),
      min(col(yCol)), max(col(yCol))).head()
    val scale = (1L << bits) - 1
    def norm(c: String, lo: Long, hi: Long): Column = {
      val span = hi - lo
      if (span <= 0L) lit(0L)
      else if (span <= scale)
        // spread the narrow range over the full id space so this column
        // still owns its share of interleave bits
        expr(s"(`$c` - CAST($lo AS BIGINT)) * CAST($scale AS BIGINT)" +
          s" DIV CAST($span AS BIGINT)")
      else {
        // wide range: bucket width first, no multiply anywhere
        val w = span / scale + 1
        expr(s"(`$c` - CAST($lo AS BIGINT)) DIV CAST($w AS BIGINT)")
      }
    }
    val zx = norm(xCol, r.getLong(0), r.getLong(1))
    val zy = norm(yCol, r.getLong(2), r.getLong(3))
    df.withColumn("__z", zValue(zx, zy, bits))
      .repartitionByRange(numRanges, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Write `df` as a parquet-backed catalog table hash-bucketed AND
    * sorted on `key` — the co-located layout that lets every downstream
    * equi-join or aggregation on `key` between same-bucketed tables run
    * with ZERO shuffle exchange and ZERO sort (Spark plans an SMJ straight
    * over the bucketed scans). This is the at-rest complement to
    * [[graft.sources.Skew.saltedJoin]]: salting fixes one skewed shuffle,
    * bucketing removes the shuffle entirely for every future join on the
    * key — at 100 TB the dominant cost of a repeated fact-fact join.
    * The table is external (explicit `path`), so the layout is plain
    * parquet on disk plus bucket metadata in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
