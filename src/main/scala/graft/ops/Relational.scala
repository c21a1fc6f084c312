package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational operator surface: scans, joins (hash/broadcast/semi/anti/outer/
  * range/as-of), aggregations (hash, distinct, rollup), windows, top-k, set ops.
  *
  * The reference (amplab/keystone) has no relational layer — its collections
  * are `RDD[T]` manipulated with map/filter (SURVEY.md §2.B). This engine
  * provides the capability Spark-first: every query below is a declarative
  * DataFrame program, so Catalyst gets predicate pushdown, column pruning,
  * partial aggregation, and AQE join planning for free.
  *
  * Determinism rules (SURVEY.md §7): money aggregates go through DECIMAL
  * casts — double summation order varies with partitioning, and at 60k+ rows
  * of ~1e5 magnitude the accumulated FP error exceeds 1e-4, which would make
  * `round(sum, 4)` nondeterministic. Decimal sums are exact and
  * order-independent; we cast to double and round only at the very end.
  * Every query ends in a total ORDER BY on a unique key set.
  *
  * 100 TB notes: joins keep equi-keys so they hash-partition; small dims are
  * broadcast explicitly; top-k uses orderBy+limit (TakeOrderedAndProject —
  * no global sort materialization); nothing collects to the driver.
  */
object Relational {

  /** Cast a 2-decimal price double to exact decimal. */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def dec2(c: Column): Column = c.cast("decimal(3,2)")
  private val one = lit(1.0).cast("decimal(3,2)")

  /** sum(extendedprice * (1 - discount)) as exact decimal -> double, 4dp. */
  private def revenueCol: Column =
    round(sum(dec(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
      .cast("double"), 4)

  // ---------------------------------------------------------------- scans

  /** Scan→filter→project with pushdown-eligible predicates.
    * Ref capability: RDD.filter/map (keystone loaders); here the predicates
    * reach the parquet reader as PushedFilters and ReadSchema keeps only the
    * 7 referenced columns of 11. */
  def qScanFilterProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .where($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
             $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
             $"l_discount".between(0.02, 0.09) && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity".cast("long").as("quantity"),
        $"l_extendedprice",
        round($"l_extendedprice" * $"l_discount", 4).as("disc_revenue"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val scanFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_quantity AS BIGINT) AS quantity,
      |  l_extendedprice,
      |  round(l_extendedprice * l_discount, 4) AS disc_revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN CAST(0.02 AS DOUBLE) AND CAST(0.09 AS DOUBLE)
      |  AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- joins

  /** Shuffled hash/sort-merge equi-join orders⋈customer + aggregation.
    * At 100 TB both sides hash-partition on the key; AQE picks SHJ/SMJ. */
  def qJoinHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec($"o_totalprice")).cast("double"), 4).as("revenue"))
      .orderBy($"c_mktsegment")
  }

  val joinHashSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Explicit broadcast join: fact lineitem ⋈ broadcast(part) ⋈
    * broadcast(supplier). Dims are tiny relative to the fact at every scale —
    * broadcasting avoids shuffling the 100 TB side entirely. */
  def qJoinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .where($"p_size" <= 25)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"), revenueCol.as("revenue"))
      .orderBy($"p_brand")
  }

  val joinBroadcastSql: String =
    """SELECT p_brand, count(*) AS n_items,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE p_size <= 25
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Left-semi join: customers that placed an urgent order. */
  def qJoinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).where($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join: customers with no orders at all. */
  def qJoinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Left-outer join: every nation with its customer count / balance sum
    * (nations without customers keep a 0 row). */
  def qJoinOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.nation(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"n_nationkey" === $"c_nationkey", "left")
      .groupBy($"n_nationkey", $"n_name")
      .agg(count($"c_custkey").as("n_customers"),
        round(coalesce(sum(dec($"c_acctbal")).cast("double"), lit(0.0)), 4).as("sum_acctbal"))
      .orderBy($"n_nationkey")
  }

  val joinOuterSql: String =
    """SELECT n_nationkey, n_name, count(c_custkey) AS n_customers,
      |  round(coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 0.0), 4) AS sum_acctbal
      |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin

  /** Range (theta) join on an equi-key: pairs of events by the same user at
    * most 10 minutes apart. The user_id equi-key keeps the join
    * hash-partitionable at scale; the time predicate is applied post-match.
    * For 100 TB streams you would additionally bucket by coarse time windows
    * to bound the per-key cross product. */
  def qJoinRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val a = e.select($"event_id".as("a_id"), $"user_id", $"ts".as("a_ts"))
    val b = e.select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    a.join(b, $"user_id" === $"b_user" && $"a_id" < $"b_id" &&
        $"b_ts" >= $"a_ts" && $"b_ts" <= $"a_ts" + expr("INTERVAL 10 MINUTES"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"user_id")
  }

  val joinRangeSql: String =
    """SELECT a.user_id, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** As-of join: for each purchase event, the latest prior click by the same
    * user. Implemented as equi-join on user + range predicate, then
    * row_number()=1 over (purchase) ordered by click time desc — the standard
    * Spark formulation; stays hash-partitioned on the join key. */
  def qJoinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val p = e.where($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
    val c = e.where($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val w = Window.partitionBy($"p_id").orderBy($"c_ts".desc, $"c_id".desc)
    p.join(c, $"user_id" === $"c_user" && $"c_ts" <= $"p_ts")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"p_id", $"user_id", $"c_id",
        (floor($"p_ts".cast("double")) - floor($"c_ts".cast("double")))
          .cast("long").as("lag_s"))
      .orderBy($"p_id")
  }

  val joinAsofSql: String =
    """WITH j AS (
      |  SELECT p.event_id AS p_id, p.user_id, c.event_id AS c_id,
      |    CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS lag_s,
      |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM events p JOIN events c
      |    ON p.user_id = c.user_id AND c.ts <= p.ts
      |  WHERE p.event_type = 'purchase' AND c.event_type = 'click')
      |SELECT p_id, user_id, c_id, lag_s FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin

  // ----------------------------------------------------------- aggregation

  /** TPC-H Q1-shaped pricing summary: the canonical partial+final hash
    * aggregation. Decimal sums keep it exact; quantity is integral so its
    * double sum is exact at any order. */
  def qAggPricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .where($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("long")).as("sum_qty"),
        round(sum(dec($"l_extendedprice")).cast("double"), 4).as("sum_base_price"),
        round(sum(dec($"l_extendedprice") * (one - dec2($"l_discount")))
          .cast("double"), 4).as("sum_disc_price"),
        round(sum(dec($"l_extendedprice") * (one - dec2($"l_discount")) *
          (one + dec2($"l_tax"))).cast("double"), 4).as("sum_charge"),
        round(sum($"l_quantity") / count(lit(1)), 4).as("avg_qty"),
        round(sum(dec($"l_extendedprice")).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(dec2($"l_discount")).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val aggPricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) *
      |    (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE), 4) AS sum_charge,
      |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Exact distinct aggregation (expands to a two-phase distinct under
    * Catalyst; partial distinct happens map-side). */
  def qAggDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val aggDistinctSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Approximate distinct via HyperLogLog++. At scale this is the
    * single-pass, fixed-memory alternative to countDistinct's two-phase
    * shuffle of the distinct keys.
    *
    * Gate design: HLL sketch internals are engine-specific, so the raw
    * estimate can never hash-match an oracle. Instead the query emits
    * the EXACT distinct count (reproducible on any engine) plus
    * `hll_within_5pct` — the sketch-vs-exact relative-error bound
    * evaluated ON THE SPARK SIDE — and the oracle asserts the bound as
    * literal TRUE. A sketch regression past ±5% flips the boolean and
    * fails the hash gate, so the estimate is driver-verified without
    * requiring cross-engine sketch equality. */
  def qAggApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("__approx"),
        countDistinct($"l_orderkey").as("exact_orders"),
        count(lit(1)).as("n_rows"))
      .select($"l_returnflag", $"exact_orders", $"n_rows",
        (abs($"__approx" - $"exact_orders").cast("double")
          / $"exact_orders" <= 0.05).as("hll_within_5pct"))
      .orderBy($"l_returnflag")
  }

  val aggApproxDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
      |  count(*) AS n_rows, TRUE AS hll_within_5pct
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Approximate quantiles via `approx_percentile` (Greenwald-Khanna
    * sketch): per-flag p50/p95/p99 of extended price. The sketch is
    * mergeable — each partition summarizes locally, partial sketches
    * merge at the reducer — so at 100 TB it replaces a full sort with a
    * bounded-memory pass, the same accuracy/cost trade the HLL row makes
    * for distinct counts.
    *
    * Gate design (same pattern as [[qAggApproxDistinct]]): GK internals
    * differ per engine, so the raw estimates can't cross-engine match.
    * The query instead RANK-CHECKS each estimate against the corpus on
    * the Spark side — v passes at quantile q iff
    * `count(< v) ≤ (q+ε)·n AND count(≤ v) ≥ (q−ε)·n` (the two-sided form
    * is the correct one under ties), ε = 1% — and emits the three
    * booleans; the oracle asserts them literal TRUE. The rank counts
    * ride ONE extra broadcast join of the 3-row sketch relation back to
    * the fact scan — no sort, no second shuffle.
    *
    * r18-drift adjudication (round 19): the driver sweep's 3.11 s never
    * reproduced — probe samples 1.85/1.93 s (untouched code, at its
    * 2.00 s r17 level; the r18 clean sweep had it at 1.82 s). Host
    * noise; no change. */
  def qAggApproxQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sk = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("p99"),
        count(lit(1)).as("n_rows"))
    val eps = 0.01
    def rankOk(q: Double, v: Column): Column = {
      val lt = sum(when($"l_extendedprice" < v, 1L).otherwise(0L))
      val le = sum(when($"l_extendedprice" <= v, 1L).otherwise(0L))
      (lt <= (lit(q) + eps) * $"nr" && le >= (lit(q) - eps) * $"nr")
    }
    Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice")
      .join(broadcast(sk.withColumnRenamed("n_rows", "nr")), "l_returnflag")
      .groupBy($"l_returnflag", $"nr", $"p50", $"p95", $"p99")
      .agg(rankOk(0.50, $"p50").as("p50_ok"),
        rankOk(0.95, $"p95").as("p95_ok"),
        rankOk(0.99, $"p99").as("p99_ok"))
      .select($"l_returnflag", $"nr".as("n_rows"),
        $"p50_ok", $"p95_ok", $"p99_ok")
      .orderBy($"l_returnflag")
  }

  val aggApproxQuantileSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** ROLLUP region→nation→grand-total of order revenue. */
  def qAggRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sfDir), $"n_regionkey" === $"r_regionkey")
      .join(Tables.orders(spark, sfDir), $"o_custkey" === $"c_custkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec($"o_totalprice")).cast("double"), 4).as("revenue"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val aggRollupSql: String =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON o_custkey = c_custkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** Full CUBE over two independent dimensions (status × priority) with
    * `grouping_id` disambiguating real NULLs from subtotal rows — the
    * grouping-sets companion to [[qAggRollup]]'s hierarchy. Catalyst
    * expands the cube into grouping sets inside ONE aggregation pass (no
    * union of 4 scans). */
  def qAggCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec($"o_totalprice")).cast("double"), 4).as("revenue"),
        grouping_id().as("gid"))
      .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
        $"o_orderpriority".asc_nulls_first)
  }

  val aggCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS revenue,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Arbitrary GROUPING SETS — the mixed set list ((status, priority),
    * (status), ()) that neither ROLLUP nor CUBE spells (it skips the
    * (priority) set). Uses Spark 4's `Dataset.groupingSets` API; planned as
    * one Expand + hash aggregation exactly like rollup/cube, so scaling is
    * |sets| × input rows into a map-side-combinable aggregate. */
  def qAggGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderstatus"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec($"o_totalprice")).cast("double"), 4).as("revenue"),
        grouping_id().as("gid"))
      .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
        $"o_orderpriority".asc_nulls_first)
  }

  val aggGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS revenue,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** UNPIVOT (melt): the revenue matrix of [[graft.ops.Analytics.qPivotRevenue]]
    * folded back to (returnflag, linestatus, revenue) rows — the inverse
    * reshape every feature store needs when a wide table feeds a long-format
    * consumer. Uses the native `unpivot` operator (Spark's melt), not a
    * hand-built union of selects. */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Analytics.qPivotRevenue(spark, sfDir)
      .unpivot(Array($"l_returnflag"), Array($"rev_f", $"rev_o"),
        "status_col", "revenue")
      .select($"l_returnflag",
        when($"status_col" === "rev_f", "F").otherwise("O").as("l_linestatus"),
        $"revenue")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val unpivotSql: String =
    s"""WITH wide AS (${Analytics.pivotRevenueSql.replace("ORDER BY l_returnflag", "")})
      |SELECT l_returnflag, 'F' AS l_linestatus, rev_f AS revenue FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'O' AS l_linestatus, rev_o AS revenue FROM wide
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Distribution windows: ntile quartiles + percent_rank + cume_dist per
    * order-status partition, totally ordered by (totalprice, orderkey) so
    * tie-carrying rows land in deterministic tiles on both engines. */
  def qWindowNtile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice",
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .where($"o_orderkey" <= 3000)
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  val windowNtileSql: String =
    """SELECT * FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |    round(percent_rank() OVER w, 6) AS pct_rank,
      |    round(cume_dist() OVER w, 6) AS cume
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey))
      |WHERE o_orderkey <= 3000 ORDER BY o_orderstatus, o_orderkey""".stripMargin

  // --------------------------------------------------------------- windows

  /** Ranking window: top-3 orders per customer by totalprice. */
  def qWindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sfDir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where($"rnk" <= 3)
      .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rnk")
  }

  val windowRankSql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  /** Cumulative frame window: running revenue per customer in order-date
    * order. The running total accumulates EXACT integer cents
    * (`round(price*100)` — o_totalprice is 2-decimal money) instead of
    * DECIMAL: same determinism guarantee, but the window sums primitive
    * longs inside codegen rather than object Decimals (~3x faster at
    * sf0.1). Mirrored in the oracle. */
  def qWindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("date").as("order_date"),
        round(sum($"cents").over(w).cast("double") / 100.0, 4).as("running_rev"))
      .orderBy($"o_custkey", $"order_date", $"o_orderkey")
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0, 4) AS running_rev
      |FROM orders ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  /** RANGE-frame window — the frame type [[qWindowRunning]]'s ROWS frame
    * doesn't cover: per customer, trailing-30-day revenue at each order.
    * The frame is defined over epoch SECONDS (timestamp cast to long on
    * the Spark side, `epoch()` in the oracle) so both engines evaluate
    * the identical inclusive value range; revenue accumulates exact
    * integer cents like the running-frame query. Peers (same customer,
    * same timestamp) get identical frames by RANGE semantics, so the
    * result is set-deterministic. */
  def qWindowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .where($"o_custkey" < 50)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"),
        round(sum($"cents").over(w).cast("double") / 100.0, 2).as("rev_30d"))
      .orderBy($"o_custkey", $"order_date", $"o_orderkey")
  }

  val windowRangeFrameSql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0, 2) AS rev_30d
      |FROM orders WHERE o_custkey < 50
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  /** Analytic window with lag: days since the customer's previous order. */
  def qWindowLag(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate".cast("date"), lag($"o_orderdate".cast("date"), 1).over(w))
          .cast("long").as("days_since_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  date_diff('day',
      |    lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    CAST(o_orderdate AS DATE)) AS days_since_prev
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------- sort / set ops

  /** Global top-k: orderBy+limit compiles to TakeOrderedAndProject — each
    * partition keeps only its local top-20, so no global sort at scale. */
  def qTopkOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Distributed TOTAL-ORDER rank over the full fact table, reported at
    * every-5000th-row milestones (the global "sorted export" primitive:
    * training-order shuffles, percentile exports, ranked file layouts).
    *
    * Scale shape — a global row_number is the textbook single-partition
    * trap: `Window.orderBy` without partitionBy funnels 100 TB through one
    * task. The scale spelling is Spark's own total sort (`orderBy` =
    * range-partitioned exchange with SAMPLED split points + per-partition
    * sort — no single task ever holds more than one range) followed by
    * `zipWithIndex`'s per-partition counts + offsets (one extra
    * count-per-partition job, no data movement). The sort key
    * (price, orderkey, linenumber) is a TOTAL order — the PK tiebreak is
    * what makes the global rank, and therefore the milestone rows,
    * engine-portable. Same discipline as [[graft.ops.Text]]'s
    * `q_word_id_encode` vocabulary ranking, here on the raw fact table. */
  def qGlobalSort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sorted = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
      .orderBy($"cents".desc, $"l_orderkey", $"l_linenumber")
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        (i + 1L, r.getLong(0), r.getInt(1), r.getLong(2)) })
      .toDF("rank", "l_orderkey", "l_linenumber", "cents")
      .where($"rank" % 5000 === 0)
      .select($"rank", $"l_orderkey", $"l_linenumber",
        round($"cents" / 100.0, 2).as("price"))
      .orderBy($"rank")
  }

  val globalSortSql: String =
    """WITH r AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (ORDER BY round(l_extendedprice * 100) DESC,
      |      l_orderkey, l_linenumber) AS rank
      |  FROM lineitem)
      |SELECT CAST(rank AS BIGINT) AS rank, l_orderkey, l_linenumber,
      |  round(cents / 100.0, 2) AS price
      |FROM r WHERE rank % 5000 = 0 ORDER BY rank""".stripMargin

  /** UNION / INTERSECT / EXCEPT (all distinct semantics) of two custkey sets:
    * BUILDING-segment customers vs urgent-order customers. */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // three set ops consume each side — materialize the two narrow key
    // columns once (ReuseAudit: five scans without it); the UNION/
    // INTERSECT/EXCEPT operators execute unchanged on the checkpoints
    val a = Tables.customer(spark, sfDir)
      .where($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .localCheckpoint(true)
    val b = Tables.orders(spark, sfDir)
      .where($"o_orderpriority" === "1-URGENT").select($"o_custkey".as("c_custkey"))
      .localCheckpoint(true)
    def cnt(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), $"n")
    cnt(a.union(b).distinct, "union")
      .unionAll(cnt(a.intersect(b), "intersect"))
      .unionAll(cnt(a.except(b), "except"))
      .orderBy($"op")
  }

  val setOpsSql: String =
    """SELECT op, n FROM (
      |  SELECT 'union' AS op, count(*) AS n FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    UNION SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  UNION ALL
      |  SELECT 'intersect', count(*) FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    INTERSECT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  UNION ALL
      |  SELECT 'except', count(*) FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
      |ORDER BY op""".stripMargin

  // ------------------------------------------------------------- registry

  /** The salted-join mechanism ([[graft.sources.Skew.saltedJoin]]) on a
    * fact ⋈ dim shape, under the oracle gate: the salt must be
    * semantically invisible, so the oracle is the PLAIN join + aggregation.
    * This is the skew remedy for the cases AQE's skew-join can't re-plan
    * (broadcast-ineligible dims, skewed agg keys): the big side scatters
    * each hot key across `salt` reducers, the dim side replicates once per
    * bucket, and the shuffle keys on (key, salt). */
  def qJoinSkewSalted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".as("suppkey"), $"l_quantity")
    val supp = Tables.supplier(spark, sfDir)
      .select($"s_suppkey".as("suppkey"), $"s_name")
    graft.sources.Skew.saltedJoin(li, supp, "suppkey", salt = 8)
      .groupBy($"suppkey", $"s_name")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy($"suppkey")
  }

  val joinSkewSaltedSql: String =
    """SELECT s_suppkey AS suppkey, s_name,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  count(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_suppkey, s_name ORDER BY suppkey""".stripMargin

  /** The Bloom-prefiltered semi-join ([[graft.sources.Bloom.semiJoin]])
    * under the oracle gate: the bitmap must be semantically invisible (no
    * false negatives; the exact semi-join behind it removes false
    * positives), so the oracle is the PLAIN `IN`-subquery spelling. The
    * scale story: at 100 TB the probe fact table is pruned by a 2 KB
    * bitmap inside whole-stage codegen BEFORE any shuffle/join sees it —
    * the explicit version of the runtime filters AQE injects for SMJ,
    * applicable to any plan shape. */
  def qBloomSemijoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val build = Tables.customer(spark, sfDir)
      .where($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 9000)
      .select($"c_custkey")
    graft.sources.Bloom.semiJoin(
        Tables.orders(spark, sfDir), "o_custkey", build, "c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(12,2)")).cast("double"), 4)
          .as("revenue"))
      .orderBy($"o_orderpriority")
  }

  val bloomSemijoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS revenue
      |FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer
      |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000)
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** Z-order layout audit ([[graft.sources.Layout.zValue]]) under the
    * oracle gate: Morton-interleave (l_partkey, l_suppkey), coarsen each
    * z-value to its 128×128 key-quad (z >> 14), and report each occupied
    * quad's row count and 2-d min-max envelope. On a z-clustered table
    * those envelopes are tight quads — exactly what makes a 2-d box
    * predicate prune blocks at a 100 TB scan — and the whole audit is
    * integer bit-arithmetic, identical in any engine. Occupied-quad count
    * is bounded by the key-space density, not the row count. */
  def qZorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val z = graft.sources.Layout.zValue($"l_partkey", $"l_suppkey", bits = 15)
    Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey",
        call_function("shiftright", z, lit(14)).as("z_bucket"))
      .groupBy($"z_bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"l_partkey").as("p_min"), max($"l_partkey").as("p_max"),
        min($"l_suppkey").as("s_min"), max($"l_suppkey").as("s_max"))
      .orderBy($"z_bucket")
  }

  val zorderLayoutSql: String = {
    val z = graft.sources.Layout.zValueSql("l_partkey", "l_suppkey", bits = 15)
    s"""WITH z AS (
       |  SELECT l_partkey, l_suppkey, ($z) >> 14 AS z_bucket
       |  FROM lineitem)
       |SELECT z_bucket, count(*) AS n_rows,
       |  min(l_partkey) AS p_min, max(l_partkey) AS p_max,
       |  min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
       |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin
  }

  /** The salted two-phase aggregation ([[graft.sources.Skew.saltedSumCount]])
    * under the oracle gate: l_returnflag has 3 values over the whole fact
    * table — the textbook skewed-aggregation key, where a plain group-by
    * funnels ~n/3 rows into each of 3 reducers no matter how many
    * executors exist. Phase 1 keys on (flag, salt-of-row) so every
    * reducer sees a bounded slice; phase 2 merges `salt` partials per
    * flag. The salt must be semantically invisible, so the oracle is the
    * PLAIN one-phase group-by. */
  def qAggSkewTwophase(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("flag"),
        $"l_quantity".cast("decimal(12,2)").as("qty"))
    graft.sources.Skew.saltedSumCount(li, "flag", "qty", salt = 16)
      .select($"flag",
        round($"sum_qty".cast("double"), 2).as("sum_qty"), $"n_rows")
      .orderBy($"flag")
  }

  val aggSkewTwophaseSql: String =
    """SELECT l_returnflag AS flag,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
      |    AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin

  /** The bucketed co-located join ([[graft.sources.Layout.writeBucketed]])
    * under the oracle gate: both sides are first written as parquet tables
    * hash-bucketed AND sorted on the customer key (8 buckets, external
    * path under the scratch dir), then joined on that key. Because bucket
    * counts match and each bucket is pre-sorted, the SMJ plans with ZERO
    * shuffle exchange and ZERO sort below the join (plan-asserted in
    * PlanShapeSpec) — the at-rest layout that makes a repeated 100 TB
    * fact-fact join cost IO only, which a broadcast can never do for two
    * big sides. The `merge` hint pins SMJ so the demonstration doesn't
    * silently degrade to a broadcast at toy scale; the bucket layout is
    * semantically invisible, so the oracle is the plain join + rollup. */
  def qBucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_warehouse").getAbsolutePath
    graft.sources.Layout.writeBucketed(
      Tables.orders(spark, sfDir)
        .select($"o_custkey", $"o_totalprice".cast("decimal(12,2)").as("o_price")),
      "graft_orders_by_cust", "o_custkey", 8, s"$base/orders_by_cust")
    graft.sources.Layout.writeBucketed(
      Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_mktsegment"),
      "graft_customer_by_cust", "c_custkey", 8, s"$base/customer_by_cust")
    spark.table("graft_orders_by_cust").hint("merge")
      .join(spark.table("graft_customer_by_cust"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_price").cast("double"), 2).as("revenue"))
      .orderBy($"c_mktsegment")
  }

  val bucketedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
      |    AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  /** Interval join WITHOUT an equi-key, spelled scale-safe: events within
    * 60 s of each other across ALL users. The naive predicate join is a
    * quadratic nested-loop; the binned spelling hashes both sides on a
    * 60-s bucket (the left side exploded into its bucket ± 1, the right
    * kept single so each qualifying pair matches EXACTLY once), then
    * applies the exact |Δt| ≤ 60 filter after the equi-join — the
    * standard interval-bin trick that turns any band join into a hash
    * join at 100 TB. Plan-asserted: no BNLJ/cartesian survives. */
  def qJoinIntervalBinned(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type",
        floor($"ts".cast("double")).cast("long").as("tsec"))
    val a = e
      .select($"event_id".as("a_id"), $"event_type".as("type_a"),
        $"tsec".as("ta"), expr("tsec DIV 60").as("ba"))
      .select($"a_id", $"type_a", $"ta",
        explode(array($"ba" - 1, $"ba", $"ba" + 1)).as("bucket"))
    val b = e
      .select($"event_id".as("b_id"), $"event_type".as("type_b"),
        $"tsec".as("tb"), expr("tsec DIV 60").as("bucket"))
    a.join(b, Seq("bucket"))
      .where($"a_id" < $"b_id" &&
        $"tb" >= $"ta" - 60 && $"tb" <= $"ta" + 60)
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"type_a", $"type_b")
  }

  val joinIntervalBinnedSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  count(*) AS n_pairs
      |FROM e a JOIN e b
      |  ON b.tsec BETWEEN a.tsec - 60 AND a.tsec + 60
      | AND a.event_id < b.event_id
      |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin

  /** Window value functions — first_value / last_value / nth_value over an
    * explicit full frame (UNBOUNDED PRECEDING .. UNBOUNDED FOLLOWING): each
    * order sees its customer's first, latest, and second order price.
    * Determinism: the partition order (o_orderdate, o_orderkey) is total,
    * and the frame is the whole partition, so every engine agrees on which
    * row is "first"/"second"/"last". The frame is customer-bounded, so
    * state per window is one customer's orders at any scale. */
  def qWindowFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .where($"o_custkey" < 300)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        floor($"o_totalprice" * 100).cast("long").as("price_c"))
      .select($"o_custkey", $"o_orderkey",
        first($"price_c").over(w).as("first_price_c"),
        last($"price_c").over(w).as("last_price_c"),
        nth_value($"price_c", 2).over(w).as("second_price_c"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowFirstLastSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders WHERE o_custkey < 300)
      |SELECT o_custkey, o_orderkey,
      |  first_value(price_c) OVER w AS first_price_c,
      |  last_value(price_c) OVER w AS last_price_c,
      |  nth_value(price_c, 2) OVER w AS second_price_c
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Multiset set ops — INTERSECT ALL / EXCEPT ALL (bag semantics, the
    * duplicate-preserving complement of [[qSetOps]]): order-priority
    * multisets of two customer segments. Bag ops hash-partition on the
    * full row like DISTINCT ops but keep per-row multiplicity counts —
    * same shuffle shape, no dedup pass. */
  def qSetOpsAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    // each segment multiset feeds three bag ops — ReuseAudit measured the
    // orders⋈customer derivation running per consumer (six orders scans);
    // materialize the two single-column multisets once (narrow rows, and
    // the INTERSECT ALL / EXCEPT ALL operators still execute unchanged
    // on the checkpointed inputs — the operator coverage is the point)
    def seg(s: String): DataFrame = o
      .join(c.where($"c_mktsegment" === s), $"o_custkey" === $"c_custkey")
      .select($"o_orderpriority")
      .localCheckpoint(true)
    val a = seg("BUILDING")
    val b = seg("AUTOMOBILE")
    def cnt(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), $"n")
    cnt(a.intersectAll(b), "intersect_all")
      .unionAll(cnt(a.exceptAll(b), "except_all"))
      .unionAll(cnt(b.exceptAll(a), "except_all_rev"))
      .orderBy($"op")
  }

  val setOpsAllSql: String =
    """WITH a AS (
      |  SELECT o_orderpriority FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING'),
      |b AS (
      |  SELECT o_orderpriority FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'AUTOMOBILE')
      |SELECT op, n FROM (
      |  SELECT 'intersect_all' AS op, count(*) AS n FROM (
      |    SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |  UNION ALL
      |  SELECT 'except_all', count(*) FROM (
      |    SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |  UNION ALL
      |  SELECT 'except_all_rev', count(*) FROM (
      |    SELECT * FROM b EXCEPT ALL SELECT * FROM a))
      |ORDER BY op""".stripMargin

  /** CDC upsert (the MERGE INTO capability class): apply a changeset to a
    * base snapshot — updates override matching keys, unmatched changes
    * insert, unmatched base rows carry over — and tag each row with the
    * op that produced it. Spelled as ONE key-partitioned full-outer join +
    * coalesce, the engine-agnostic core of every lakehouse MERGE: at
    * 100 TB both sides hash on the key (bucket both tables on it and the
    * merge is shuffle-free), and no driver state exists. The "changeset"
    * is a deterministic slice of orders with a formula price bump so the
    * gate can verify every branch (update / insert / keep). */
  def qUpsertSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val base = o.where($"o_orderkey" < 8000)
      .select($"o_orderkey", $"o_orderstatus".as("b_status"),
        floor($"o_totalprice" * 100).cast("long").as("b_price"))
    val changes = o.where($"o_orderkey" >= 4000 && $"o_orderkey" < 12000)
      .select($"o_orderkey", lit("U").as("c_status"),
        (floor($"o_totalprice" * 100).cast("long") + 500L).as("c_price"))
    base.join(changes, Seq("o_orderkey"), "full_outer")
      .select($"o_orderkey",
        coalesce($"c_status", $"b_status").as("status"),
        coalesce($"c_price", $"b_price").as("price_c"),
        when($"c_status".isNotNull && $"b_status".isNotNull, "update")
          .when($"c_status".isNotNull, "insert")
          .otherwise("keep").as("op"))
      .orderBy($"o_orderkey")
  }

  val upsertSnapshotSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS b_status,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS b_price
      |  FROM orders WHERE o_orderkey < 8000),
      |changes AS (
      |  SELECT o_orderkey, 'U' AS c_status,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) + 500 AS c_price
      |  FROM orders WHERE o_orderkey >= 4000 AND o_orderkey < 12000)
      |SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
      |  coalesce(c.c_status, b.b_status) AS status,
      |  coalesce(c.c_price, b.b_price) AS price_c,
      |  CASE WHEN c.c_status IS NOT NULL AND b.b_status IS NOT NULL THEN 'update'
      |       WHEN c.c_status IS NOT NULL THEN 'insert'
      |       ELSE 'keep' END AS op
      |FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** CDC changeset generation (the inverse of [[qUpsertSnapshot]]): diff
    * two snapshots of the same keyed table and emit the minimal change
    * feed — inserts (key only in new), deletes (key only in old), updates
    * (key in both, any value changed) — dropping unchanged rows. The two
    * "snapshots" are deterministic slices of orders with a formula
    * mutation on a key subset so every branch provably fires. Same
    * key-partitioned full-outer-join core as the upsert; at scale the
    * null-safe value comparison happens inside codegen after the join, so
    * only changed rows survive into the output shuffle. */
  def qSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    // old snapshot: keys < 10000 as-is; new snapshot: keys 2000..12000,
    // with every key divisible by 3 getting a formula price bump
    val old = o.where($"o_orderkey" < 10000)
      .select($"o_orderkey", floor($"o_totalprice" * 100).cast("long").as("o_price"))
    val neu = o.where($"o_orderkey" >= 2000 && $"o_orderkey" < 12000)
      .select($"o_orderkey",
        (floor($"o_totalprice" * 100).cast("long") +
          when($"o_orderkey" % 3 === 0, 700L).otherwise(0L)).as("n_price"))
    old.join(neu, Seq("o_orderkey"), "full_outer")
      .select($"o_orderkey",
        when($"o_price".isNull, "insert")
          .when($"n_price".isNull, "delete")
          .when(!($"o_price" <=> $"n_price"), "update").as("op"),
        $"o_price", $"n_price")
      .where($"op".isNotNull)
      .orderBy($"o_orderkey")
  }

  val snapshotDiffSql: String =
    """WITH old AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS o_price
      |  FROM orders WHERE o_orderkey < 10000),
      |neu AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) +
      |    CASE WHEN o_orderkey % 3 = 0 THEN 700 ELSE 0 END AS n_price
      |  FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 12000)
      |SELECT * FROM (
      |  SELECT coalesce(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
      |    CASE WHEN old.o_price IS NULL THEN 'insert'
      |         WHEN neu.n_price IS NULL THEN 'delete'
      |         WHEN old.o_price IS DISTINCT FROM neu.n_price THEN 'update'
      |         END AS op,
      |    old.o_price, neu.n_price
      |  FROM old FULL OUTER JOIN neu ON old.o_orderkey = neu.o_orderkey)
      |WHERE op IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  /** Incremental view maintenance for a distributive aggregate: the
    * pricing-summary view is kept up to date by MERGING the base
    * snapshot's partial aggregates with the partial aggregates of a new
    * batch — never rescanning the base. Base = shipments before
    * 1997-01-01, delta = everything after; both sides reduce to
    * per-(flag, status) partials (count / Σqty / Σprice-cents, all longs)
    * and the merge is a second |groups|-bounded aggregation over their
    * union. The DuckDB oracle recomputes the view from the FULL table in
    * one pass — so a green row is the IVM correctness statement itself:
    * merge(partials) ≡ recompute(whole).
    *
    * Scale shape: this is the pattern that turns a daily 100 TB rescan
    * into an O(|delta| + |groups|) refresh — the base partials would be a
    * stored constant-size table in production; both aggregations here are
    * two-phase hash aggs with map-side combine, and the merge shuffle
    * carries |groups| rows. */
  def qIncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_linestatus", $"l_shipdate",
        $"l_quantity".cast("long").as("qty"),
        expr("CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT)")
          .as("cents"))
    val cut = lit("1997-01-01").cast("timestamp")
    def partials(df: DataFrame): DataFrame =
      df.groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"qty").as("sq"), sum($"cents").as("sc"))
    partials(li.where($"l_shipdate" < cut))
      .unionAll(partials(li.where($"l_shipdate" >= cut)))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"n").as("n_rows"), sum($"sq").as("sum_qty"),
        sum($"sc").as("sc"))
      .select($"l_returnflag", $"l_linestatus", $"n_rows", $"sum_qty",
        round($"sc".cast("double") / 100.0, 2).as("sum_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val incrementalAggSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  round(CAST(sum(CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2)) * 100)
      |    AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_price
      |FROM lineitem
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incremental_agg" -> (qIncrementalAgg _),
    "q_global_sort" -> (qGlobalSort _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_agg_skew_twophase" -> (qAggSkewTwophase _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_upsert_snapshot" -> (qUpsertSnapshot _),
    "q_window_first_last" -> (qWindowFirstLast _),
    "q_set_ops_all" -> (qSetOpsAll _),
    "q_join_interval_binned" -> (qJoinIntervalBinned _),
    "q_zorder_layout" -> (qZorderLayout _),
    "q_bloom_semijoin" -> (qBloomSemijoin _),
    "q_scan_filter_project" -> (qScanFilterProject _),
    "q_join_hash" -> (qJoinHash _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_outer" -> (qJoinOuter _),
    "q_join_range" -> (qJoinRange _),
    "q_join_asof" -> (qJoinAsof _),
    "q_join_skew_salted" -> (qJoinSkewSalted _),
    "q_agg_pricing_summary" -> (qAggPricingSummary _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_approx_distinct" -> (qAggApproxDistinct _),
    "q_agg_approx_quantile" -> (qAggApproxQuantile _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_grouping_sets" -> (qAggGroupingSets _),
    "q_unpivot" -> (qUnpivot _),
    "q_window_ntile" -> (qWindowNtile _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_range_frame" -> (qWindowRangeFrame _),
    "q_window_lag" -> (qWindowLag _),
    "q_topk_orders" -> (qTopkOrders _),
    "q_set_ops" -> (qSetOps _))

  val oracle: Map[String, String] = Map(
    "q_global_sort" -> globalSortSql,
    "q_incremental_agg" -> incrementalAggSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_agg_skew_twophase" -> aggSkewTwophaseSql,
    "q_bucketed_join" -> bucketedJoinSql,
    "q_upsert_snapshot" -> upsertSnapshotSql,
    "q_window_first_last" -> windowFirstLastSql,
    "q_set_ops_all" -> setOpsAllSql,
    "q_join_interval_binned" -> joinIntervalBinnedSql,
    "q_zorder_layout" -> zorderLayoutSql,
    "q_bloom_semijoin" -> bloomSemijoinSql,
    "q_scan_filter_project" -> scanFilterProjectSql,
    "q_join_hash" -> joinHashSql,
    "q_join_broadcast" -> joinBroadcastSql,
    "q_join_semi" -> joinSemiSql,
    "q_join_anti" -> joinAntiSql,
    "q_join_outer" -> joinOuterSql,
    "q_join_range" -> joinRangeSql,
    "q_join_asof" -> joinAsofSql,
    "q_join_skew_salted" -> joinSkewSaltedSql,
    "q_agg_pricing_summary" -> aggPricingSummarySql,
    "q_agg_distinct" -> aggDistinctSql,
    "q_agg_approx_distinct" -> aggApproxDistinctSql,
    "q_agg_approx_quantile" -> aggApproxQuantileSql,
    "q_agg_rollup" -> aggRollupSql,
    "q_agg_cube" -> aggCubeSql,
    "q_agg_grouping_sets" -> aggGroupingSetsSql,
    "q_unpivot" -> unpivotSql,
    "q_window_ntile" -> windowNtileSql,
    "q_window_rank" -> windowRankSql,
    "q_window_running" -> windowRunningSql,
    "q_window_range_frame" -> windowRangeFrameSql,
    "q_window_lag" -> windowLagSql,
    "q_topk_orders" -> topkOrdersSql,
    "q_set_ops" -> setOpsSql)
}
