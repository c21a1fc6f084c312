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
    * and its optimizer-estimated size fits `memBudgetBytes`. Returns a
    * [[CacheHandle]] — the caller releases it when the consuming scope
    * ends (eager `fit()` bodies bracket with [[withCached]]; lazily
    * returned query frames must NOT persist at all and should rely on
    * exchange reuse instead, which is why the declared dedup query no
    * longer calls this). */
  def cacheIfWorthIt(df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30): CacheHandle = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val worth = uses > 1 && estBytes <= BigInt(memBudgetBytes)
    if (worth) CacheHandle(df.persist(StorageLevel.MEMORY_AND_DISK), cached = true)
    else CacheHandle(df, cached = false)
  }

  /** Bracketed form for eager multi-pass consumers: persist if worthwhile,
    * run `body` against the (possibly cached) frame, always release. */
  def withCached[T](df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30)(body: DataFrame => T): T = {
    val h = cacheIfWorthIt(df, uses, memBudgetBytes)
    try body(h.df) finally h.release()
  }

  /** Estimated size (bytes) of the optimized plan — exposed for tests and
    * for pipeline authors deciding block sizes. */
  def estimatedSize(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
