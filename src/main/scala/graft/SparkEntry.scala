package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's registry; each key has a
  * matching DuckDB-runnable ANSI SQL in `oracleSql` unless the operator is
  * inherently engine-specific (hashing, approximate algorithms, model
  * training), in which case the driver records a rows-only check and the
  * ScalaTest suites carry the correctness argument.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary: scan → pushdown filter → two-phase
    * hash aggregation → sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggPricingSummary(spark, "/root/testdata/sf0.001")

  private val families: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (Analytics.queries, Analytics.oracle),
      (Scalar.queries, Scalar.oracle),
      (Sessions.queries, Sessions.oracle),
      (Text.queries, Text.oracle),
      (Vectors.queries, Vectors.oracle),
      (Similarity.queries, Similarity.oracle),
      (Images.queries, Images.oracle),
      (Eval.queries, Eval.oracle),
      (Quality.queries, Quality.oracle),
      (Formats.queries, Formats.oracle),
      (Stats.queries, Stats.oracle))

  /** Per-family query registries — exposed so the driver-contract test can
    * assert the merged map loses nothing to key collisions WITHOUT keeping
    * its own copy of the family list (a second copy goes stale the moment a
    * family is added; round 7's red suite was exactly that). */
  def familyQueryMaps: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    families.map(_._1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    families.iterator.map(_._2).reduce(_ ++ _)
}
