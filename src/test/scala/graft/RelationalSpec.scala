package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Row-level checks of the relational surface on sf0.001. Expected values
  * pinned with DuckDB on the same parquet (tools/parity.py idioms). */
class RelationalSpec extends GraftSuite {

  test("driver contract: every declared query has an oracle") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // since round 10 even the engine-specific sketches (HLL distinct, GK
    // quantile) are gated: they emit exact values + Spark-evaluated
    // error-bound booleans the oracle asserts literal TRUE
    assert(qs == os, s"queries missing an oracle: ${qs -- os}")
    // a registry collision (two families declaring one key) would silently
    // drop a query from the gate — sizes must add up. The family list comes
    // from SparkEntry itself (single source of truth) so this test cannot
    // go stale when a new family registers.
    val familyTotal = SparkEntry.familyQueryMaps.map(_.size).sum
    assert(familyTotal == qs.size, "duplicate query key across families")
  }

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

  test("q_window_first_last: frame edges agree with a direct group walk") {
    val r = rows(Relational.qWindowFirstLast(spark, sf))
    assert(r.nonEmpty)
    val byCust = r.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { grp =>
      // every row of one customer reports the same first/last/second
      assert(grp.map(_.getAs[Long]("first_price_c")).distinct.size == 1)
      assert(grp.map(_.getAs[Long]("last_price_c")).distinct.size == 1)
      val second = grp.map(x =>
        Option(x.getAs[Any]("second_price_c"))).distinct
      assert(second.size == 1)
      // singleton partitions have no second row → null
      if (grp.size == 1) assert(second.head.isEmpty)
      else assert(second.head.isDefined)
    }
  }

  test("q_upsert_snapshot: merge branches reconcile with the two inputs") {
    val r = rows(Relational.qUpsertSnapshot(spark, sf))
    val ops = r.groupBy(_.getAs[String]("op")).view.mapValues(_.size).toMap
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val nBase = o.where(col("o_orderkey") < 8000).count()
    val nChg = o.where(col("o_orderkey") >= 4000 && col("o_orderkey") < 12000).count()
    assert(ops.getOrElse("update", 0) + ops.getOrElse("insert", 0) == nChg)
    assert(ops.getOrElse("update", 0) + ops.getOrElse("keep", 0) == nBase)
    assert(r.size == nBase + ops.getOrElse("insert", 0))
    // every updated/inserted row carries the changeset's status and bump
    r.filter(_.getAs[String]("op") != "keep")
      .foreach(x => assert(x.getAs[String]("status") == "U"))
    assert(r.map(_.getAs[Long]("o_orderkey")).distinct.size == r.size,
      "merge output must be key-unique")
  }

  test("q_snapshot_diff: emits exactly the changed keys with the right ops") {
    val r = rows(Relational.qSnapshotDiff(spark, sf))
    val o = spark.read.parquet(s"$sf/orders.parquet")
    def keys(lo: Long, hi: Long) = o
      .where(col("o_orderkey") >= lo && col("o_orderkey") < hi)
    val ops = r.groupBy(_.getAs[String]("op")).view.mapValues(_.size).toMap
    assert(ops.getOrElse("insert", 0).toLong == keys(10000, 12000).count())
    assert(ops.getOrElse("delete", 0).toLong == keys(0, 2000).count())
    assert(ops.getOrElse("update", 0).toLong ==
      keys(2000, 10000).where(col("o_orderkey") % 3 === 0).count())
    // unchanged rows must NOT appear
    r.filter(_.getAs[String]("op") == "update").foreach { x =>
      assert(x.getAs[Long]("n_price") == x.getAs[Long]("o_price") + 700L)
    }
  }

  test("q_agg_skew_twophase: salted two-phase agg equals the plain group-by") {
    val salted = rows(Relational.qAggSkewTwophase(spark, sf))
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity").cast("decimal(12,2)"))
        .cast("double"), 2).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(salted == plain, "salt must be semantically invisible")
  }

  test("q_bucketed_join: result matches the plain unbucketed join") {
    val bucketed = rows(Relational.qBucketedJoin(spark, sf))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("double"), 2).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(bucketed == plain, "bucket layout must be semantically invisible")
  }

  test("q_set_ops_all: bag identities hold vs raw multiset sizes") {
    val m = rows(Relational.qSetOpsAll(spark, sf))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    def segN(s: String): Long = o.join(
      c.where(col("c_mktsegment") === s),
      col("o_custkey") === col("c_custkey")).count()
    // |A| = |A ∩all B| + |A \all B| — the defining bag identity
    assert(m("intersect_all") + m("except_all") == segN("BUILDING"))
    assert(m("intersect_all") + m("except_all_rev") == segN("AUTOMOBILE"))
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

  test("q_agg_approx_distinct: exact counts match and HLL bound holds") {
    val r = rows(Relational.qAggApproxDistinct(spark, sf))
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val flag = row.getString(0)
      assert(row.getAs[Long]("exact_orders") == exact(flag))
      // the ±5% sketch-vs-exact bound is evaluated inside the query
      // itself (that boolean is what the DuckDB oracle gates on);
      // rsd=0.02 leaves margin
      assert(row.getAs[Boolean]("hll_within_5pct"),
        s"HLL estimate for $flag off by >5%")
    }
    // INDEPENDENT bound recomputation — shares no expression with the
    // query's in-query boolean: re-estimate with the same rsd straight
    // off the parquet, compute the relative error in driver-side Scala,
    // and assert the 5% literal HERE. A vacuous or inverted in-query
    // bound cannot satisfy this layer.
    val indep = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(indep.keySet == exact.keySet)
    indep.foreach { case (flag, a) =>
      val err = math.abs(a.toDouble - exact(flag)) / exact(flag)
      assert(err <= 0.05,
        s"independent HLL recheck: $flag relative error $err > 0.05")
    }
  }

  test("q_agg_approx_quantile: all GK rank-error bounds hold") {
    val r = rows(Relational.qAggApproxQuantile(spark, sf))
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val flag = row.getString(0)
      assert(row.getAs[Long]("n_rows") == exact(flag))
      // GK with accuracy 10000 guarantees rank error <= n/10000; the
      // query rank-checks each estimate at ±1% rank with the two-sided
      // tie-correct form and emits the verdicts the oracle gates on
      for (name <- Seq("p50_ok", "p95_ok", "p99_ok"))
        assert(row.getAs[Boolean](name),
          s"$flag $name: GK estimate outside exact ±1%-rank band")
    }
    // INDEPENDENT recomputation — fresh approx_percentile estimates off
    // the parquet, exact lt/le rank counts over collected raw values,
    // two-sided tie-correct band asserted in plain Scala with test-local
    // literals. The query's in-query rank booleans play no part here.
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_returnflag", "l_extendedprice").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2) }
    val est = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)").as("ps"))
      .collect().map(x => x.getString(0) -> x.getSeq[Double](1)).toMap
    assert(est.keySet == raw.keySet)
    for ((flag, vals) <- raw; ((q, v), label) <-
        Seq(0.50, 0.95, 0.99).zip(est(flag)).zip(Seq("p50", "p95", "p99"))) {
      val n = vals.length.toDouble
      val lt = vals.count(_ < v)
      val le = vals.count(_ <= v)
      assert(lt <= (q + 0.01) * n && le >= (q - 0.01) * n,
        s"independent GK recheck: $flag $label=$v lt=$lt le=$le n=$n")
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

  test("q_agg_cube grouping sets reconcile with the grand total") {
    val r = rows(Relational.qAggCube(spark, sf))
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val byGid = r.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), "cube must emit all 4 grouping sets")
    // each grouping set partitions the full order count
    byGid.foreach { case (gid, rs) =>
      assert(rs.map(_.getAs[Long]("n_orders")).sum == nOrders,
        s"grouping set $gid must cover every order")
    }
    assert(byGid(3L).size == 1, "exactly one grand-total row")
  }

  test("q_agg_grouping_sets emits exactly the three declared sets") {
    val r = rows(Relational.qAggGroupingSets(spark, sf))
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val byGid = r.groupBy(_.getAs[Long]("gid"))
    // (status, priority) -> gid 0, (status) -> gid 1, () -> gid 3;
    // the skipped (priority)-only set (gid 2) must NOT appear
    assert(byGid.keySet == Set(0L, 1L, 3L), "mixed set list skips gid 2")
    byGid.foreach { case (gid, rs) =>
      assert(rs.map(_.getAs[Long]("n_orders")).sum == nOrders,
        s"grouping set $gid must cover every order")
    }
    assert(byGid(3L).size == 1, "exactly one grand-total row")
  }

  test("q_unpivot is the exact inverse reshape of the pivot") {
    val long = rows(Relational.qUnpivot(spark, sf))
    val wide = rows(graft.ops.Analytics.qPivotRevenue(spark, sf))
    assert(long.size == wide.size * 2)
    val cells = wide.flatMap(w => Seq(
      (w.getString(0), "F") -> w.getAs[Double]("rev_f"),
      (w.getString(0), "O") -> w.getAs[Double]("rev_o"))).toMap
    long.foreach { l =>
      val k = (l.getString(0), l.getString(1))
      assert(cells(k) == l.getAs[Double]("revenue"), s"cell $k must round-trip")
    }
  }

  test("q_window_ntile quartiles are balanced and ranks lie in [0,1]") {
    val r = rows(Relational.qWindowNtile(spark, sf))
    r.foreach { x =>
      val q = x.getAs[Long]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = x.getAs[Double]("pct_rank")
      val cd = x.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
    }
    // within a partition, ntile sizes differ by at most 1
    r.groupBy(_.getString(0)).foreach { case (st, rs) =>
      val sizes = rs.groupBy(_.getAs[Long]("quartile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$st quartiles unbalanced: $sizes")
    }
  }

  test("q_join_interval_binned equals the direct predicate join") {
    import spark.implicits._
    import graft.ops.Relational
    val r = Relational.qJoinIntervalBinned(spark, sf)
    // naive spelling on the small fixture: same pair population
    val e = tables.Tables.events(spark, sf)
      .select($"event_id", $"event_type",
        floor($"ts".cast("double")).cast("long").as("tsec"))
    val direct = e.as("a").join(e.as("b"),
        $"a.event_id" < $"b.event_id" &&
          $"b.tsec" >= $"a.tsec" - 60 && $"b.tsec" <= $"a.tsec" + 60)
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_direct"))
    val bad = r.join(direct, Seq("type_a", "type_b"), "full_outer")
      .where($"n_pairs".isNull || $"n_direct".isNull ||
        $"n_pairs" =!= $"n_direct").count()
    assert(bad == 0, "binned join must reproduce the naive band join exactly")
  }

  test("q_asset_dedup groups assets exactly by the generator period") {
    import spark.implicits._
    import graft.ops.Images
    val r = Images.qAssetDedup(spark, sf).collect()
    assert(r.length == 256, "640 assets collide into 256 content groups")
    assert(r.map(_.getAs[Long]("n_copies")).sum == 640)
    // keep ids are the first occurrence of each residue class: 0..255
    assert(r.map(_.getAs[Long]("keep_id")).sorted.toSeq == (0L until 256L))
    // copies: ids 0..127 appear 3x (640 = 2*256 + 128), 128..255 appear 2x
    r.foreach { row =>
      val expected = if (row.getAs[Long]("keep_id") < 128) 3L else 2L
      assert(row.getAs[Long]("n_copies") == expected)
    }
  }

  test("q_global_sort milestones equal a driver-side total sort") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
      .map(r => (math.round(r.getDouble(2) * 100), r.getLong(0), r.getInt(1)))
    val sorted = li.sortBy { case (c, o, l) => (-c, o, l) }
    val expect = sorted.iterator.zipWithIndex.collect {
      case ((c, o, l), i) if (i + 1) % 5000 == 0 =>
        (i + 1L, o, l, c / 100.0)
    }.toSeq
    val got = rows(Relational.qGlobalSort(spark, sf)).map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty, "sf0.001 has >= 5000 lineitems")
    assert(got == expect, s"got $got want $expect")
    // the plan must carry a range-partitioned sort, never a
    // single-partition global window
    val plan = Relational.qGlobalSort(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global sort must not window:\n$plan")
  }

  test("the SQL front door: temp views and graft kernels from spark.sql") {
    import org.apache.spark.sql.functions._
    // a user of the library can stay in SQL text: tables as temp views,
    // the injected graft_* kernels resolvable by name
    graft.tables.Tables.lineitem(spark, sf).createOrReplaceTempView("li_v")
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM li_v GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val viaDf = graft.tables.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(col("l_returnflag")).collect()
    assert(viaSql.toSeq == viaDf.toSeq)
    val k = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_shingles('a b c', 2) AS s,
        |       graft_bpe('the', 't h;th e') AS b""".stripMargin).head()
    assert(k.getDouble(0) == 11.0)
    assert(k.getSeq[String](1) == Seq("a b", "b c"))
    assert(k.getSeq[String](2) == Seq("the"))
  }
}
