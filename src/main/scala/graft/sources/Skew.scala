package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation + partitioned sinks (builder brief: "salting for skew,
  * AQE for runtime re-plan"; AQE skew-join handles sort-merge skew
  * automatically — salting is for the cases AQE can't re-plan, e.g. a
  * skewed aggregation key or a broadcast-ineligible dimension).
  */
object Skew {

  /** Salted equi-join: scatter the big side's rows across `salt` buckets
    * (deterministic hash of the full row, so one hot key spreads over
    * `salt` reducers) and replicate the small side once per bucket.
    * Semantically identical to `big.join(small, key)` for inner joins;
    * shuffle key becomes (key, salt) — no single reducer sees a hot key's
    * full volume. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val bigCols = big.columns.map(col)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(bigCols: _*), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase group-by where phase 1 keys on
    * (key, salt-of-row) and phase 2 merges the partials — the classic fix
    * for one dominant group key. Aggregations must be algebraic
    * (sum/count/min/max columns produced by `partialAggs`). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salt: Int): DataFrame = {
    df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).as("n_rows"))
  }
}

/** Partitioned parquet sinks — the layout that makes partition pruning
  * (a `PartitionFilters` entry at the scan, zero IO for excluded
  * partitions) available to every downstream reader. */
object Sinks {
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
}
