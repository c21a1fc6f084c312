package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the co-located-join scale path (builder brief:
  * "repartition/bucketing for co-located joins").
  *
  * A fact table bucketed AND sorted by its join key joins against another
  * table bucketed the same way with NO Exchange on either side: at 100 TB
  * that deletes the dominant shuffle of every fact-to-fact join. The
  * plan-level guarantee (SortMergeJoin with zero ShuffleExchange operators)
  * is asserted in BucketingSpec, not just claimed. */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwrites; also
    * clears an orphaned managed location left by a previous session — the
    * in-memory catalog forgets tables on restart but the warehouse dir
    * survives). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. The caller can
    * verify shuffle-freedom via [[numShuffles]]. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession, left: String,
      right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Count shuffle exchanges in the executed plan (0 for a properly
    * co-located join). Unwraps AdaptiveSparkPlanExec — its `collect` has
    * no children — and counts both raw exchanges and AQE's materialized
    * shuffle query stages. */
  def numShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleQueryStageExec => 1 + walk(s.plan)
      case e: ShuffleExchangeExec => 1 + e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
