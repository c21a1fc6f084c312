package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Canonical loaders for the driver-generated testdata tables.
  *
  * Schemas verified in FIXTURES.md (pyarrow dumps of the real parquet).
  * Design notes for 100 TB scale:
  *  - Loaders return plain `spark.read.parquet` scans so Catalyst sees the
  *    relation directly — predicate pushdown / column pruning / partition
  *    pruning all reach the file source (no opaque wrappers, no RDDs).
  *  - No canonicalization happens eagerly: casts are applied per-query so
  *    unused columns never enter the plan (ReadSchema stays minimal).
  *  - `events.ts` is stored as ns in parquet; Spark truncates to µs on read.
  *    Queries that bucket time always `date_trunc` to >= second so results
  *    are stable across readers (SURVEY.md §7 determinism rules).
  */
object Tables {
  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  def region(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "region"))
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "nation"))
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "customer"))
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "supplier"))
  def part(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "part"))
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "orders"))
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "lineitem"))
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects by
    * default. Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * at build time (Verify / Bench / the test fixture all do) so the column
    * arrives as a raw long; this loader then truncates ns → µs — the exact
    * same truncation DuckDB applies — so both engines see identical µs
    * timestamps (FIXTURES.md ⚠ note). The loader itself is side-effect
    * free: it never mutates session conf. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(path(sfDir, "events"))
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "embeddings"))
}
