package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Analytic extensions beyond the original §2.B grid: pivot, exact
  * quantiles, EXISTS subqueries, ordered string aggregation, FILTER-clause
  * conditional aggregation. Same determinism discipline as Relational
  * (decimal money math, round(…,4), total ORDER BY).
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")

  /** PIVOT: revenue matrix returnflag × linestatus (explicit value list so
    * the output schema is static — required for both the oracle and any
    * sane downstream consumer). */
  def qPivotRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(dec($"l_extendedprice")).cast("double"), 4))
      .select($"l_returnflag",
        coalesce($"F", lit(0.0)).as("rev_f"),
        coalesce($"O", lit(0.0)).as("rev_o"))
      .orderBy($"l_returnflag")
  }

  val pivotRevenueSql: String =
    """SELECT l_returnflag,
      |  coalesce(round(CAST(sum(CASE WHEN l_linestatus = 'F'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE), 4), 0.0) AS rev_f,
      |  coalesce(round(CAST(sum(CASE WHEN l_linestatus = 'O'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE), 4), 0.0) AS rev_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact quantiles (median / p90) per group — Spark `percentile` and
    * DuckDB `quantile_cont` share linear interpolation on the sorted
    * values, so the results hash-match after round(4). */
  def qQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"))
      .orderBy($"l_returnflag")
  }

  val quantilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Correlated EXISTS / NOT EXISTS subqueries (TPC-H Q4 shape): order
    * priority counts for orders that do/don't have any high-quantity line.
    * Catalyst rewrites the correlated EXISTS into a left-semi/anti join. */
  def qExistsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count_if(EXISTS (
        |    SELECT 1 FROM v_lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)) AS n_with_bulk
        |FROM v_orders o
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val existsSubquerySql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)) AS n_with_bulk
      |FROM orders o
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Ordered string aggregation per group (listagg capability) over a
    * bounded subset — the output stays row-sized because the input is
    * filtered first (an unbounded listagg is a scale bug, not a feature). */
  def qStringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .where($"c_custkey" <= 100)
      .groupBy($"c_mktsegment")
      .agg(
        concat_ws(",", array_sort(collect_list($"c_name"))).as("names"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  val stringAggSql: String =
    """SELECT c_mktsegment,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names,
      |  count(*) AS n
      |FROM customer WHERE c_custkey <= 100
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** FILTER-clause conditional aggregation: one pass, many predicates —
    * the idiomatic replacement for N separate filtered scans. */
  def qConditionalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        count_if($"o_totalprice" > 200000).as("n_big"),
        count_if($"o_orderpriority" === "1-URGENT").as("n_urgent"),
        round(sum(when($"o_totalprice" > 200000, dec($"o_totalprice")))
          .cast("double"), 4).as("big_revenue"))
      .orderBy($"o_orderstatus")
  }

  val conditionalAggSql: String =
    """SELECT o_orderstatus,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    FILTER (WHERE o_totalprice > 200000) AS DOUBLE), 4) AS big_revenue
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot_revenue" -> (qPivotRevenue _),
    "q_quantiles" -> (qQuantiles _),
    "q_exists_subquery" -> (qExistsSubquery _),
    "q_string_agg" -> (qStringAgg _),
    "q_conditional_agg" -> (qConditionalAgg _))

  val oracle: Map[String, String] = Map(
    "q_pivot_revenue" -> pivotRevenueSql,
    "q_quantiles" -> quantilesSql,
    "q_exists_subquery" -> existsSubquerySql,
    "q_string_agg" -> stringAggSql,
    "q_conditional_agg" -> conditionalAggSql)
}
