package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => ScTest}

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * `sbt test` fast; suites must not mutate session conf). Mirrors the
  * Verify/Bench builder settings, including the nanosAsLong flag the
  * events table needs (Tables.scala). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf: String = SparkTestBase.sf

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** Array-column accessor (Spark hands back mutable.ArraySeq). */
  def dArr(row: Row, name: String): IndexedSeq[Double] =
    row.getSeq[Double](row.fieldIndex(name)).toIndexedSeq

  /** Run a ScalaCheck property and fail the ScalaTest assertion if it does
    * not pass (no scalatestplus bridge in the offline cache — drive
    * scalacheck's own Test runner directly). */
  def checkProp(prop: Prop, name: String): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"scalacheck property '$name' failed: ${res.status}")
  }
}
