package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical loaders for the driver-generated testdata tables.
  *
  * Schemas verified in FIXTURES.md (pyarrow dumps of the real parquet).
  * Design notes for 100 TB scale:
  *  - Loaders return plain `spark.read.parquet` scans so Catalyst sees the
  *    relation directly — predicate pushdown / column pruning / partition
  *    pruning all reach the file source (no opaque wrappers, no RDDs).
  *  - No canonicalization happens eagerly: casts are applied per-query so
  *    unused columns never enter the plan (ReadSchema stays minimal).
  *  - `events.ts` arrives as ns-longs or µs-NTZ depending on generator
  *    vintage; [[Tables.events]] canonicalizes both to session-local µs
  *    TIMESTAMP. Queries that bucket time always `date_trunc` to >= second
  *    so results are stable across readers (SURVEY.md §7 determinism rules).
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
  /** `events.ts` normalization — the generator has shipped this column two
    * ways across rounds, and this loader canonicalizes BOTH to the same
    * session-local TIMESTAMP so every downstream query (epoch-second
    * bucketing via `cast(ts AS double)`, windowing, sessionization) sees
    * one type:
    *  - TIMESTAMP(NANOS) parquet: Spark 4 rejects it unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` is set at session build
    *    (Verify / Bench / the test fixture all do); the raw long is then
    *    truncated ns → µs — the same truncation DuckDB applies.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet (pyarrow default):
    *    Spark reads TIMESTAMP_NTZ, which rejects numeric casts; with the
    *    session timezone pinned to UTC (all builders do), casting to the
    *    local-timezone TIMESTAMP is value-identical and restores the type
    *    every tsec computation expects.
    * The loader itself is side-effect free: it never mutates session conf. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(path(sfDir, "events"))
    val fromLong = () => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    val fromNtz  = () => raw.withColumn("ts", col("ts").cast(TimestampType))
    // Dispatch on the inferred type, but DON'T trust it blindly: under
    // parallel test suites the path-keyed schema inference has been
    // observed to disagree with the type the SAME plan resolves to at
    // analysis (round 7: the LongType arm fired against an NTZ column →
    // DATATYPE_MISMATCH). `withColumn` analyzes eagerly, so a wrong arm
    // throws HERE — catch it and apply the other arm, making the loader
    // correct under whichever schema analysis actually sees.
    val arms = raw.schema("ts").dataType match {
      case LongType         => Seq(fromLong, fromNtz)
      case TimestampNTZType => Seq(fromNtz, fromLong)
      case TimestampType    => Seq(() => raw)
      case _                => Seq(fromLong, fromNtz, () => raw)
    }
    arms.view.flatMap(f => scala.util.Try(f()).toOption).headOption
      .getOrElse(raw)
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "embeddings"))
}
