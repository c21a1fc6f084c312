package graft

import org.apache.spark.sql.functions._
import graft.ops.Analytics

/** Analytic extensions: pivot, quantiles, EXISTS subqueries, string agg,
  * conditional agg. */
class AnalyticsSpec extends GraftSuite {

  test("q_pivot_revenue cells reconcile with the unpivoted totals") {
    val pivoted = Analytics.qPivotRevenue(spark, sf)
    val total = pivoted.agg(sum(col("rev_f") + col("rev_o"))).head.getDouble(0)
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(round(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double"), 4))
      .head.getDouble(0)
    assert(math.abs(total - direct) < 0.1,
      s"pivot must partition total revenue: $total vs $direct")
  }

  test("q_quantiles are ordered and bracketed by min/max") {
    val q = Analytics.qQuantiles(spark, sf)
    assert(q.where(col("median_price") > col("p90_price")).count() == 0)
    val bounds = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx")).head()
    val rows = q.collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("median_price") >= bounds.getAs[Double]("mn"))
      assert(r.getAs[Double]("p90_price") <= bounds.getAs[Double]("mx"))
    }
  }

  test("q_exists_subquery bulk counts never exceed order counts") {
    val r = Analytics.qExistsSubquery(spark, sf)
    assert(r.where(col("n_with_bulk") > col("n_orders")).count() == 0)
    assert(r.agg(sum("n_orders")).head.getLong(0) == 1500)
  }

  test("q_string_agg name lists agree with their counts") {
    val r = Analytics.qStringAgg(spark, sf).collect()
    r.foreach { row =>
      val names = row.getAs[String]("names").split(",")
      assert(names.length == row.getAs[Long]("n"))
      assert(names.toSeq == names.toSeq.sorted, "listagg must be ordered")
    }
  }

  test("q_conditional_agg filtered counts partition correctly") {
    val r = Analytics.qConditionalAgg(spark, sf)
    assert(r.where(col("n_big") > col("n_orders")).count() == 0)
    assert(r.where(col("n_urgent") > col("n_orders")).count() == 0)
    assert(r.where(col("n_big") > 0 && col("big_revenue") <= 0).count() == 0)
  }
}
