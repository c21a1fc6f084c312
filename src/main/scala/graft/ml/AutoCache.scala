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

  /** Decide-and-persist: cache `df` iff it will be consumed `uses` times
    * and its optimizer-estimated size fits `memBudgetBytes`. Returns the
    * (possibly persisted) frame plus the decision for observability. */
  def cacheIfWorthIt(df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30): (DataFrame, Boolean) = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val worth = uses > 1 && estBytes <= BigInt(memBudgetBytes)
    if (worth) (df.persist(StorageLevel.MEMORY_AND_DISK), true)
    else (df, false)
  }

  /** Estimated size (bytes) of the optimized plan — exposed for tests and
    * for pipeline authors deciding block sizes. */
  def estimatedSize(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
