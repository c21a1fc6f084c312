package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Row-level checks of the relational surface on sf0.001. Expected values
  * pinned with DuckDB on the same parquet (tools/parity.py idioms). */
class RelationalSpec extends GraftSuite {

  test("q_agg_pricing_summary matches pinned Q1-shape goldens") {
    val r = rows(Relational.qAggPricingSummary(spark, sf))
    assert(r.size == 6)
    val af = r.find(x => x.getString(0) == "A" && x.getString(1) == "F").get
    assert(af.getAs[Long]("sum_qty") == 20488L)
    assert(af.getAs[Long]("count_order") == 809L)
    val nf = r.find(x => x.getString(0) == "N" && x.getString(1) == "F").get
    assert(nf.getAs[Long]("sum_qty") == 23213L)
  }

  test("q_topk_orders returns global top-20 in order") {
    val r = rows(Relational.qTopkOrders(spark, sf))
    assert(r.size == 20)
    assert(r.head.getAs[Long]("o_orderkey") == 988L)
    assert(r.head.getAs[Double]("o_totalprice") == 499705.05)
    val prices = r.map(_.getAs[Double]("o_totalprice"))
    assert(prices == prices.sortBy(-_), "top-k must be sorted desc")
  }

  test("semi and anti join partition the customer set") {
    val semi = Relational.qJoinSemi(spark, sf).count()
    val anti = Relational.qJoinAnti(spark, sf).count()
    val withOrders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    val all = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi + anti >= 0)
    assert(semi <= withOrders || anti == all - semi,
      s"semi=$semi anti=$anti should partition relative to their filters")
  }

  test("q_agg_rollup totals are consistent across levels") {
    val r = Relational.qAggRollup(spark, sf)
    val grand = r.where(col("r_name").isNull && col("n_name").isNull)
      .select("n_orders").head.getLong(0)
    val regionSum = r.where(col("r_name").isNotNull && col("n_name").isNull)
      .agg(sum("n_orders")).head.getLong(0)
    val nationSum = r.where(col("n_name").isNotNull)
      .agg(sum("n_orders")).head.getLong(0)
    assert(grand == regionSum && grand == nationSum,
      s"rollup levels disagree: grand=$grand region=$regionSum nation=$nationSum")
  }

  test("q_agg_approx_distinct is within rsd bounds of exact") {
    val r = rows(Relational.qAggApproxDistinct(spark, sf))
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { row =>
      val flag = row.getString(0)
      val approx = row.getAs[Long]("approx_orders").toDouble
      val ex = exact(flag).toDouble
      assert(math.abs(approx - ex) / ex < 0.1,
        s"HLL estimate for $flag off by >10%: $approx vs $ex")
    }
  }

  test("q_window_rank keeps at most 3 orders per customer, ranked") {
    val r = Relational.qWindowRank(spark, sf)
    val maxPer = r.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(maxPer <= 3)
    val bad = r.where(col("rnk") > 3).count()
    assert(bad == 0)
  }

  test("q_set_ops row counts obey set algebra") {
    val r = rows(Relational.qSetOps(spark, sf)).map(x =>
      x.getString(0) -> x.getAs[Long]("n")).toMap
    assert(r("union") >= r("intersect"))
    assert(r("union") >= r("except"))
    assert(r("union") <= r("intersect") + r("except") + r("union"))
  }
}
