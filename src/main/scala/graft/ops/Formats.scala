package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_schema_merge" -> (qSchemaMerge _))

  val oracle: Map[String, String] = Map(
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_schema_merge" -> schemaMergeSql)
}
