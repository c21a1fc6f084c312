package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cost-based persist insertion — the reference's headline optimizer idea
  * (AutoCacheRule, SURVEY §4): profile an intermediate's size, and cache it
  * only when (a) it is consumed by more than one downstream action/branch
  * and (b) it fits the memory budget. Catalyst never auto-persists
  * (ReuseExchange only dedupes identical exchanges within one plan), so
  * cross-branch reuse is the one place a planner outside Catalyst earns
  * its keep.
  *
  * Kept deliberately small: the decision input is Catalyst's own optimized
  * plan statistics (`sizeInBytes` propagates from parquet footers through
  * filters/projections), so no sampling pass is needed for the common case.
  */
object AutoCache {

  /** The possibly-persisted frame plus a release hook: whoever takes the
    * cache decision owns the unpersist. `release()` is a no-op when the
    * planner declined, so callers always call it (try/finally) without
    * re-checking the decision. */
  final case class CacheHandle(df: DataFrame, cached: Boolean) {
    def release(): Unit = if (cached) df.unpersist()
  }

  /** Decide-and-persist: cache `df` iff it will be consumed `uses` times
    * and its estimated size fits `memBudgetBytes`. Returns a
    * [[CacheHandle]] — the caller releases it when the consuming scope
    * ends (eager `fit()` bodies bracket with [[withCached]]; lazily
    * returned query frames must NOT persist at all and should rely on
    * exchange reuse instead, which is why the declared dedup query no
    * longer calls this).
    *
    * Plans with trustworthy Catalyst stats decide for free. Plans whose
    * stats are sentinel-derived (see [[planStats]]) are PERSISTED FIRST
    * and then profiled, so the profiling `count()` doubles as the first
    * consumer's materialization pass when the cache is accepted — the
    * only wasted pass is the over-budget decline, where one pass is the
    * unavoidable price of learning the size at all. */
  def cacheIfWorthIt(df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30): CacheHandle = {
    if (uses <= 1) return CacheHandle(df, cached = false)
    val budget = BigInt(memBudgetBytes)
    planStats(df) match {
      case Some(stats) =>
        if (stats <= budget)
          CacheHandle(df.persist(StorageLevel.MEMORY_AND_DISK), cached = true)
        else CacheHandle(df, cached = false)
      case None =>
        df.persist(StorageLevel.MEMORY_AND_DISK)
        if (profiledSize(df) <= budget) CacheHandle(df, cached = true)
        else { df.unpersist(); CacheHandle(df, cached = false) }
    }
  }

  /** Bracketed form for eager multi-pass consumers: persist if worthwhile,
    * run `body` against the (possibly cached) frame, always release. */
  def withCached[T](df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30)(body: DataFrame => T): T = {
    val h = cacheIfWorthIt(df, uses, memBudgetBytes)
    try body(h.df) finally h.release()
  }

  /** Catalyst's optimized-plan size estimate, or None when it is
    * sentinel-derived and therefore meaningless.
    *
    * An RDD-backed scan (the CIFAR binary loader, any `rdd.toDF`) reports
    * `defaultSizeInBytes` (Long.MaxValue by default); visitors then SCALE
    * that sentinel — a column-narrowing projection multiplies it by the
    * row-width ratio, a join by the other side — so the poisoned value
    * can land anywhere huge, not only at or above the sentinel itself.
    * Both screens are needed: `>= defaultSizeInBytes` catches
    * sentinel-preserving plans even when the conf is tuned low (a common
    * broadcast-join knob), and the absolute [[SaneStatsCeiling]] catches
    * scaled-down sentinel descendants — no honest single-frame estimate
    * reaches a pebibyte. */
  private[graft] def planStats(df: DataFrame): Option[BigInt] = {
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val sentinelDerived =
      stats >= BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes) ||
        stats >= SaneStatsCeiling
    if (sentinelDerived) None else Some(stats)
  }

  private val SaneStatsCeiling = BigInt(1L << 50) // 1 PiB

  /** Estimated size (bytes) — exposed for tests and for pipeline authors
    * deciding block sizes: Catalyst's estimate when trustworthy, else the
    * reference's profiling behavior (one exact distributed `count()` plus
    * a bounded driver-side sample of row widths). */
  def estimatedSize(df: DataFrame): BigInt =
    planStats(df).getOrElse(profiledSize(df))

  private val SampleRows = 100

  private def profiledSize(df: DataFrame): BigInt = {
    val n = df.count()
    if (n == 0L) BigInt(0)
    else {
      val sample = df.head(SampleRows)
      val avg = sample.iterator.map(rowBytes).sum / sample.length
      BigInt(n) * avg
    }
  }

  /** Crude per-row heap footprint — a cost-model input, not an exact
    * accounting. */
  private def rowBytes(r: org.apache.spark.sql.Row): Long =
    16L + r.toSeq.iterator.map {
      case null => 1L
      case _: Boolean | _: Byte => 1L
      case _: Short => 2L
      case _: Int | _: Float => 4L
      case _: Long | _: Double => 8L
      case s: String => 8L + s.length
      case a: Array[Byte] => 8L + a.length
      case xs: scala.collection.Seq[_] => 8L + xs.length * 8L
      case m: scala.collection.Map[_, _] => 8L + m.size * 16L
      case nested: org.apache.spark.sql.Row => rowBytes(nested)
      case d: java.math.BigDecimal => 16L + d.precision()
      case _ => 16L
    }.sum
}
