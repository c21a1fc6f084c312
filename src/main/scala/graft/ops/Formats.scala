package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Storage-format coverage beyond the canonical parquet path: the ORC
  * round trip and schema-evolution (mergeSchema) reads.
  *
  * The reference's loader layer reads CSV/JSON/binary records (SURVEY.md
  * §2.A loaders); the Spark-native equivalents are the built-in file
  * sources. Parquet is this repo's canonical format (every query +
  * Verify); these two queries prove the OTHER production format paths
  * work end-to-end — write → read → aggregate — with the oracle computing
  * the same result straight from the parquet tables, so any value lost or
  * mangled in the round trip fails the hash gate.
  *
  * Scale notes: both formats are splittable columnar files behind the same
  * FileSourceScanExec machinery as parquet — pushdown and pruning apply
  * unchanged (ORC carries its own min/max indexes). mergeSchema at 100 TB
  * is a footer-sampling operation (spark.sql.parquet.mergeSchema reads
  * footers, not data); the columns absent in a fragment surface as nulls,
  * which is exactly what the aggregation below asserts.
  */
object Formats {

  private def tmpDir(sfDir: String, tag: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_$safe"
  }

  /** ORC round trip: a lineitem slice is written to ORC, read back, and
    * aggregated. Doubles, strings and bigints all cross the format
    * boundary; the oracle aggregates the same slice from parquet, so one
    * bit of drift anywhere in the ORC writer/reader fails the gate. */
  def qOrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = tmpDir(sfDir, "orc")
    Tables.lineitem(spark, sfDir)
      .where($"l_orderkey" < 5000)
      .select($"l_orderkey", $"l_returnflag", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(floor($"l_extendedprice" * 100).cast("long")).as("sum_price_c"),
        countDistinct($"l_orderkey").as("n_orders"))
      .orderBy($"l_returnflag")
  }

  val orcRoundtripSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem WHERE l_orderkey < 5000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** CSV round trip with QUOTING STRESS: every row carries a synthetic
    * string containing the field separator and embedded double quotes —
    * exactly what breaks naive CSV handling — written with Spark's
    * RFC-4180 quoting (quote doubling) and read back with an explicit
    * schema. The oracle computes the same aggregates from the original
    * parquet, so a mangled delimiter or a dropped quote anywhere in the
    * writer/reader fails the hash gate. Embedded NEWLINES are deliberately
    * out of scope: they force `multiLine=true`, which makes CSV files
    * non-splittable — at 100 TB that's a format-choice error, not a
    * reader option.
    *
    * Scale notes: header CSV with explicit schema stays splittable and
    * codegen-scanned; numeric fidelity crosses the text boundary via the
    * cent floor (doubles print/parse round-trip exactly in Spark's
    * Ryu-style formatter, but the gate shouldn't depend on it). */
  def qCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = tmpDir(sfDir, "csv")
    Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_brand",
        concat($"p_name", lit(",\""), $"p_type", lit("\",")).as("stress"),
        $"p_retailprice")
      .write.mode("overwrite").option("header", "true")
      // Spark's CSV default backslash-escapes embedded quotes; setting
      // escape = quote char yields true RFC-4180 quote DOUBLING on the
      // wire, so external RFC readers parse these files too
      .option("escape", "\"").csv(dir)
    spark.read.option("header", "true").option("escape", "\"")
      .schema("p_partkey LONG, p_brand STRING, stress STRING, p_retailprice DOUBLE")
      .csv(dir)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum(length($"stress")).cast("long").as("stress_chars"),
        sum(floor($"p_retailprice" * 100).cast("long")).as("sum_price_c"),
        countDistinct($"p_partkey").as("n_parts"))
      .orderBy($"p_brand")
  }

  val csvRoundtripSql: String =
    """SELECT p_brand, count(*) AS n,
      |  CAST(sum(length(p_name || ',"' || p_type || '",')) AS BIGINT) AS stress_chars,
      |  CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  count(DISTINCT p_partkey) AS n_parts
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Schema-evolution read: two parquet fragments with DIFFERENT schemas
    * (an early slice carrying quantity, a later slice carrying price —
    * the classic "column added to the feed mid-stream" shape) are read
    * together with mergeSchema; columns absent in a fragment must surface
    * as nulls, and every present value must survive. The oracle recomputes
    * the per-fragment aggregates straight from lineitem. */
  def qSchemaMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = tmpDir(sfDir, "merge")
    val li = Tables.lineitem(spark, sfDir)
    li.where($"l_orderkey" < 2500)
      .select($"l_orderkey", $"l_quantity")
      .write.mode("overwrite").parquet(s"$base/v1")
    li.where($"l_orderkey" >= 2500 && $"l_orderkey" < 5000)
      .select($"l_orderkey", floor($"l_extendedprice" * 100).cast("long").as("price_c"))
      .write.mode("overwrite").parquet(s"$base/v2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$base/v1", s"$base/v2")
      .agg(count(lit(1)).as("n_rows"),
        count($"l_quantity").as("n_qty"),
        count($"price_c").as("n_price"),
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum($"price_c").as("sum_price_c"))
  }

  val schemaMergeSql: String =
    """SELECT
      |  count(*) AS n_rows,
      |  CAST(sum(CASE WHEN l_orderkey < 2500 THEN 1 ELSE 0 END) AS BIGINT) AS n_qty,
      |  CAST(sum(CASE WHEN l_orderkey >= 2500 THEN 1 ELSE 0 END) AS BIGINT) AS n_price,
      |  CAST(sum(CASE WHEN l_orderkey < 2500 THEN l_quantity END) AS BIGINT) AS sum_qty,
      |  CAST(sum(CASE WHEN l_orderkey >= 2500 THEN CAST(floor(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS sum_price_c
      |FROM lineitem WHERE l_orderkey < 5000""".stripMargin

  // ------------------------------------------------- table-layout planning

  /** Compaction bin target, in document characters (the stand-in for file
    * bytes on the synthetic corpus). */
  val CompactTarget = 4096L

  /** Small-files compaction planning — the OPTIMIZE/bin-packing planner
    * every table format (Delta, Iceberg, Hudi) runs over file metadata.
    * Files are the per-(lang, source) document groups sized by character
    * count; per table-partition (`lang`), files UNDER the target
    * participate in scan-order greedy packing (cumulative size, a bin
    * closes once it crosses [[CompactTarget]] — the straddling file stays
    * in its bin, exactly Delta OPTIMIZE's semantics), while files already
    * AT/over target are left in place (reported as the `bin = -1` class:
    * rewriting them would be wasted IO).
    *
    * Scale shape (100 TB): the plan runs on the FILE-METADATA relation —
    * 5-6 orders of magnitude smaller than the corpus (a 100 TB table at
    * 128 MB files is ~800k metadata rows). The cumulative sum is a
    * per-table-partition window over that metadata, so no window task
    * ever sees corpus-scale input; the corpus itself is never read. */
  def qCompactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val files = Tables.documents(spark, sfDir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("docs"), sum($"n_chars").as("bytes"))
    val small = $"bytes" < CompactTarget
    val w = Window.partitionBy($"lang").orderBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum(when(small, $"bytes").otherwise(0L)).over(w))
      .withColumn("bin",
        when(small, floor(($"cum" - $"bytes") / CompactTarget)).otherwise(lit(-1L)))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_files"), sum($"docs").as("n_docs"),
        sum($"bytes").as("bytes"),
        min($"source").as("first_file"), max($"source").as("last_file"))
      .orderBy($"lang", $"bin")
  }

  val compactionPlanSql: String =
    s"""WITH f AS (
      |  SELECT lang, source, count(*) AS docs, sum(n_chars) AS bytes
      |  FROM documents GROUP BY 1, 2),
      |c AS (
      |  SELECT lang, source, docs, bytes,
      |    sum(CASE WHEN bytes < $CompactTarget THEN bytes ELSE 0 END)
      |      OVER (PARTITION BY lang ORDER BY source
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM f)
      |SELECT lang,
      |  CAST(CASE WHEN bytes < $CompactTarget
      |       THEN (cum - bytes) // $CompactTarget ELSE -1 END AS BIGINT) AS bin,
      |  count(*) AS n_files, CAST(sum(docs) AS BIGINT) AS n_docs,
      |  CAST(sum(bytes) AS BIGINT) AS bytes,
      |  min(source) AS first_file, max(source) AS last_file
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Zone-map (min/max statistics) data-skipping audit — the
    * effectiveness measurement behind parquet row-group pruning and
    * every lakehouse's file-skipping story. Each (lang, source) file
    * carries a [min, max] zone on `n_chars`; for the band predicate
    * `n_chars BETWEEN 300 AND 400` a file is skippable iff its zone
    * cannot intersect the band. The output proves safety arithmetically:
    * `n_match_total` (matches counted over ALL files) must equal
    * `n_match_scanned` (matches counted only in non-skipped files) — a
    * zone map that would have pruned a matching row shows up as a
    * mismatch, and the DuckDB oracle re-derives both sides.
    *
    * Scale shape: one corpus-linear aggregation builds the zones (in a
    * real table this is free — parquet footers already carry min/max);
    * the skip decision and audit are metadata-scale. */
  def qZonemapSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (lo, hi) = (300L, 400L)
    Tables.documents(spark, sfDir)
      .groupBy($"lang", $"source")
      .agg(min($"n_chars").as("zmin"), max($"n_chars").as("zmax"),
        count(lit(1)).as("docs"),
        sum(when($"n_chars".between(lo, hi), 1L).otherwise(0L)).as("m"))
      .withColumn("skippable", $"zmax" < lo || $"zmin" > hi)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_files"),
        sum(when($"skippable", 1L).otherwise(0L)).as("n_skipped"),
        sum(when($"skippable", $"docs").otherwise(0L)).as("rows_pruned"),
        sum($"m").as("n_match_total"),
        sum(when(!$"skippable", $"m").otherwise(0L)).as("n_match_scanned"))
      .orderBy($"lang")
  }

  val zonemapSkippingSql: String =
    """WITH z AS (
      |  SELECT lang, source, min(n_chars) AS zmin, max(n_chars) AS zmax,
      |    count(*) AS docs,
      |    sum(CASE WHEN n_chars BETWEEN 300 AND 400 THEN 1 ELSE 0 END) AS m
      |  FROM documents GROUP BY 1, 2),
      |s AS (
      |  SELECT *, (zmax < 300 OR zmin > 400) AS skippable FROM z)
      |SELECT lang, count(*) AS n_files,
      |  CAST(sum(CASE WHEN skippable THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
      |  CAST(sum(CASE WHEN skippable THEN docs ELSE 0 END) AS BIGINT) AS rows_pruned,
      |  CAST(sum(m) AS BIGINT) AS n_match_total,
      |  CAST(sum(CASE WHEN NOT skippable THEN m ELSE 0 END) AS BIGINT) AS n_match_scanned
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_schema_merge" -> (qSchemaMerge _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_zonemap_skipping" -> (qZonemapSkipping _))

  val oracle: Map[String, String] = Map(
    "q_csv_roundtrip" -> csvRoundtripSql,
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_schema_merge" -> schemaMergeSql,
    "q_compaction_plan" -> compactionPlanSql,
    "q_zonemap_skipping" -> zonemapSkippingSql)
}
