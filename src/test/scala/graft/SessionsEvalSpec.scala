package graft

import org.apache.spark.sql.functions._
import graft.ops.{Eval, Sessions}

/** Windowing/sessionization + evaluator checks on sf0.001. */
class SessionsEvalSpec extends GraftSuite {

  test("q_ewma_daily: month-start seeds equal raw revenue; ewma tracks the series") {
    val r = rows(Sessions.qEwmaDaily(spark, sf))
    assert(r.nonEmpty)
    // on the first day of each month the weighted sum has one term, so
    // ewma == revenue (to the 2dp rounding)
    val firsts = r.filter(_.getDate(0).toLocalDate.getDayOfMonth == 1)
    assert(firsts.nonEmpty)
    firsts.foreach { x =>
      assert(math.abs(x.getDouble(2) - x.getDouble(1)) < 0.011,
        s"month-start ewma must equal that day's revenue: $x")
    }
    // every ewma lies within the month's [min, max] revenue envelope —
    // a convex combination can't escape the data range
    val byMonth = r.groupBy(x => (x.getDate(0).toLocalDate.getYear,
      x.getDate(0).toLocalDate.getMonthValue))
    byMonth.foreach { case (_, xs) =>
      val revs = xs.map(_.getDouble(1))
      val (lo, hi) = (revs.min - 0.011, revs.max + 0.011)
      xs.foreach { x =>
        assert(x.getDouble(2) >= lo && x.getDouble(2) <= hi,
          s"ewma escaped the month's revenue envelope: $x")
      }
    }
  }

  test("q_interval_merge: coverage bounded by interval algebra") {
    val r = rows(Sessions.qIntervalMerge(spark, sf))
    assert(r.nonEmpty)
    // per supplier: every merged span is at least the longest single
    // interval (1..7 days + inclusive endpoints => >= 2 days), and covered
    // days can never exceed the sum of raw interval lengths
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_suppkey").as("s"), to_date(col("l_shipdate")).as("st"))
      .withColumn("len",
        pmod(datediff(col("st"), lit("1970-01-01").cast("date")), lit(7)) + 2)
      .groupBy("s").agg(sum("len").as("raw_total"), count(lit(1)).as("n_iv"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    r.foreach { x =>
      val (rawTotal, nIv) = raw(x.getLong(0))
      assert(x.getLong(1) >= 1L && x.getLong(1) <= nIv,
        s"span count must be in [1, n_intervals]: $x")
      assert(x.getLong(2) <= rawTotal,
        s"merged coverage can't exceed the raw interval-length sum: $x")
      assert(x.getLong(2) >= 2L, s"at least one 2-day span: $x")
    }
    assert(r.map(_.getLong(0)).toSet ==
      raw.keySet, "every supplier with lineitems gets a coverage row")
  }

  test("q_stream_tumbling buckets partition all events") {
    val total = Sessions.qStreamTumbling(spark, sf).agg(sum("n")).head.getLong(0)
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(total == events)
  }

  test("q_stream_sliding puts each event in exactly 4 overlapping windows") {
    val slid = Sessions.qStreamSliding(spark, sf).agg(sum("n")).head.getLong(0)
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(slid == 4 * events, s"1h/15min slide => 4 windows per event ($slid vs ${4 * events})")
  }

  test("q_sessionize: sessions partition each user's events; durations non-negative") {
    val s = Sessions.qSessionize(spark, sf)
    val sessEvents = s.agg(sum("n_events")).head.getLong(0)
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(sessEvents == events)
    assert(s.where(col("duration_s") < 0).count() == 0)
    // session ids are dense 1..K per user
    val bad = s.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("k"))
      .where(col("mx") =!= col("k")).count()
    assert(bad == 0)
  }

  test("q_activity_streaks: islands partition each user's active days") {
    val s = Sessions.qActivityStreaks(spark, sf)
    // streak totals reconcile with the distinct (user, day) relation
    val activeSum = s.agg(sum("active_days")).head.getLong(0)
    // go through the canonical loader: the generator has shipped ts as
    // ns-longs AND µs-NTZ across rounds, and a hard-coded conversion here
    // breaks whenever the vintage flips (it did in round 7)
    val userDays = tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().count()
    assert(activeSum == userDays, "streak lengths must partition active days")
    // per-user invariants: longest <= active_days, n_streaks <= active_days,
    // and longest * n_streaks >= active_days (pigeonhole)
    val bad = s.where(col("longest_streak") > col("active_days") ||
      col("n_streaks") > col("active_days") ||
      col("longest_streak") * col("n_streaks") < col("active_days")).count()
    assert(bad == 0)
  }

  test("q_scd2_intervals: per-user intervals chain without overlap, runs collapsed") {
    val r = rows(graft.ops.Sessions.qScd2Intervals(spark, sf))
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("user_id")).values.foreach { grp =>
      val sorted = grp.sortBy(_.getAs[Long]("valid_from"))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          // interval chain: each valid_to is exactly the next valid_from
          assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"))
          // runs collapsed: adjacent intervals never share a type
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
        case _ =>
      }
      // only the last interval is open
      assert(sorted.dropRight(1).forall(x => !x.isNullAt(x.fieldIndex("valid_to"))))
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")))
    }
  }

  test("q_eval_binary metrics are internally consistent") {
    val m = Eval.qEvalBinary(spark, sf).head()
    val tp = m.getAs[Long]("tp").toDouble
    val fp = m.getAs[Long]("fp").toDouble
    val fn = m.getAs[Long]("fn").toDouble
    val prec = m.getAs[Double]("precision")
    val rec = m.getAs[Double]("recall")
    assert(math.abs(prec - tp / (tp + fp)) < 1e-3)
    assert(math.abs(rec - tp / (tp + fn)) < 1e-3)
  }

  test("q_confusion_matrix cells sum to the scored population") {
    val cm = Eval.qConfusionMatrix(spark, sf)
    val total = cm.agg(sum("n")).head.getLong(0)
    assert(total == 500)
    assert(cm.count() == 100, "10x10 dense confusion grid")
  }

  test("q_mean_avg_precision is a valid probability per class") {
    val r = Eval.qMeanAvgPrecision(spark, sf)
    assert(r.count() == 10)
    assert(r.where(col("ap") < 0 || col("ap") > 1).count() == 0)
  }

  test("q_funnel stages are monotone and conversions in (0, 1]") {
    val r = graft.ops.Sessions.qFunnel(spark, sf).head()
    val (n, v, c, p) = (r.getAs[Long]("n_sessions"), r.getAs[Long]("stage_view"),
      r.getAs[Long]("stage_click"), r.getAs[Long]("stage_purchase"))
    assert(n >= v && v >= c && c >= p && p >= 0,
      s"funnel must narrow: $n >= $v >= $c >= $p")
    assert(v > 0 && c > 0, "the synthetic events reach at least two stages")
    val cv = r.getAs[Double]("conv_view_click")
    assert(cv > 0 && cv <= 1.0)
  }

  test("q_cohort_retention offset 0 equals the cohort's size") {
    import spark.implicits._
    val r = rows(graft.ops.Sessions.qCohortRetention(spark, sf))
    assert(r.nonEmpty)
    val byCohort = r.groupBy(_.get(0))
    byCohort.foreach { case (day, rs) =>
      val m = rs.map(x => x.getAs[Long]("offset_d") -> x.getAs[Long]("users")).toMap
      assert(m.contains(0L), s"cohort $day missing offset 0")
      // day-0 actives = everyone whose FIRST purchase was that day; no
      // later offset can exceed the cohort size
      assert(m.values.forall(_ <= m(0L)),
        s"cohort $day retention cannot exceed its size: $m")
    }
  }

  test("q_gap_fill densifies each user's span and carries LOCF across gaps") {
    val r = Sessions.qGapFill(spark, sf)
    // per-user row count == calendar span length (dense, no holes)
    val spanBad = r.groupBy(col("user_id"))
      .agg(count(lit(1)).as("rows"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
      .where(col("rows") =!= col("span")).count()
    assert(spanBad == 0, "every user's calendar span is fully densified")
    // gap rows are zero-revenue; observed rows keep their cents
    assert(r.where(!col("observed") && col("cents") =!= 0).count() == 0)
    // LOCF is defined everywhere (spans start at an observed day) and
    // equals cents on observed days
    assert(r.where(col("locf_cents").isNull).count() == 0)
    assert(r.where(col("observed") && col("locf_cents") =!= col("cents"))
      .count() == 0)
    // observed day count reconciles with the raw purchase relation
    val observedDays = r.where(col("observed")).count()
    val direct = tables.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().count()
    assert(observedDays == direct)
  }

  test("q_udaf_geomean equals exp(avg(ln x)) computed directly") {
    val r = Eval.qUdafGeomean(spark, sf)
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(round(exp(avg(log(col("l_extendedprice")))), 4).as("expected"))
    val joined = r.join(direct, "l_returnflag")
    val bad = joined.where(abs(col("geomean_price") - col("expected")) > 0.01).count()
    assert(bad == 0)
  }

  test("q_rolling_anomaly: every flag clears 3 trailing sigmas, recomputed in doubles") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val flagged = ops.Sessions.qRollingAnomaly(spark, sf)
    assert(flagged.where($"n_prev" < 4).count() == 0)
    assert(flagged.count() > 0, "the sf fixture must produce some anomalies")
    // recompute the trailing mean/variance in plain double arithmetic and
    // confirm each flagged event sits strictly outside 3 sigma
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-7, -1)
    val stats = tables.Tables.events(spark, sf)
      .where($"event_type" === "purchase")
      .select($"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("x"),
        $"user_id", $"ts")
      .select($"event_id", $"x",
        count($"x").over(w).as("n"),
        avg($"x".cast("double")).over(w).as("mu"),
        var_pop($"x".cast("double")).over(w).as("v"))
    val joined = flagged.join(stats, "event_id")
    val notOutlier = joined.where(
      pow($"cents".cast("double") - $"mu", 2) <= lit(9.0) * $"v" + lit(1e-6))
    assert(notOutlier.count() == 0,
      "every flagged event must exceed 3 trailing sigmas")
  }

  test("q_rfm_segments: cells partition the purchase population exactly") {
    import spark.implicits._
    val r = ops.Sessions.qRfmSegments(spark, sf)
    assert(r.where($"r_band" < 1 || $"r_band" > 3 || $"f_band" < 1 ||
      $"f_band" > 3 || $"m_band" < 1 || $"m_band" > 3).count() == 0)
    val p = tables.Tables.events(spark, sf)
      .where($"event_type" === "purchase")
    val users = p.select($"user_id").distinct().count()
    assert(r.agg(sum($"n_users")).head.getLong(0) == users,
      "every purchasing user lands in exactly one RFM cell")
    val cents = p.agg(
      sum(($"value".cast("decimal(18,2)") * 100).cast("long"))).head.getLong(0)
    assert(r.agg(sum($"sum_cents")).head.getLong(0) == cents,
      "cell monetary totals must cover all purchase cents")
  }

  test("q_event_transitions: rows sum to 1, transitions cover all events minus firsts") {
    import spark.implicits._
    val r = ops.Sessions.qEventTransitions(spark, sf)
    // each prev_type's probabilities sum to ~1 (6 dp rounding slack)
    val rowSums = r.groupBy($"prev_type").agg(sum($"prob").as("p")).collect()
    rowSums.foreach(row => assert(math.abs(row.getAs[Double]("p") - 1.0) < 1e-4,
      s"row ${row.getString(0)} sums to ${row.getAs[Double]("p")}"))
    // transition count = events - one unlagged first event per user
    val ev = tables.Tables.events(spark, sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(r.agg(sum($"c")).head.getLong(0) == expected)
  }

  test("q_volume_bursts: every burst bucket really doubles its trailing mean") {
    import spark.implicits._
    val r = ops.Sessions.qVolumeBursts(spark, sf)
    assert(r.count() > 0, "sf fixture must contain bursts")
    assert(r.where($"n_prev" < 12).count() == 0)
    // division-free gate re-checked in doubles
    val bad = r.where($"c".cast("double") <=
      lit(2.0) * $"trailing_sum" / $"n_prev").count()
    assert(bad == 0, "burst rows must exceed 2x the trailing mean")
    // hour alignment: bucket starts sit on whole hours
    assert(r.where($"hour_start" % 3600 =!= 0).count() == 0)
  }

  test("q_rolling_actives: WAU >= DAU, both bounded by the user population") {
    import spark.implicits._
    val r = ops.Sessions.qRollingActives(spark, sf)
    assert(r.where($"dau" > $"wau").count() == 0)
    val users = tables.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(r.where($"wau" > users).count() == 0)
    // every calendar day with activity appears
    val days = tables.Tables.events(spark, sf)
      .select(to_date($"ts")).distinct().count()
    assert(r.count() >= days, "window ends cover at least every active day")
    // day-level DAU reconciles with a direct distinct count
    val direct = tables.Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .groupBy($"day").agg(countDistinct($"user_id").as("expected"))
    val bad = r.join(direct, "day")
      .where($"dau" =!= $"expected").count()
    assert(bad == 0)
  }

  test("q_cohort_ltv: cumulative money is monotone and covers offset revenue") {
    import spark.implicits._
    val r = ops.Sessions.qCohortLtv(spark, sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.get(0)).foreach { case (cohort, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("offset_d"))
      val cums = sorted.map(_.getAs[Long]("cum_cents"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a },
        s"cohort $cohort cumulative revenue must be monotone")
      assert(cums.head == sorted.head.getAs[Long]("cents"),
        "first offset's cumulative equals its own revenue")
      assert(sorted.map(_.getAs[Long]("cents")).sum == cums.last)
    }
  }

  test("q_dow_profile: ppm indexes average to ~uniform across the week") {
    import spark.implicits._
    val r = ops.Sessions.qDowProfile(spark, sf)
    assert(r.where($"dow" < 0 || $"dow" > 6).count() == 0)
    // per type: sum of shares = 1 week → sum(index) ≈ 7e6 ppm (floor slack)
    val sums = r.groupBy($"event_type").agg(sum($"index_ppm").as("s")).collect()
    sums.foreach { row =>
      val s = row.getAs[Long]("s")
      assert(s > 6999900 && s <= 7000000, s"${row.getString(0)} index sum $s")
    }
  }

  test("q_hourly_autocorr: r in [-1, 1] with enough pairs") {
    import spark.implicits._
    val r = ops.Sessions.qHourlyAutocorr(spark, sf)
    assert(r.where($"r_lag24" < -1.0 || $"r_lag24" > 1.0).count() == 0)
    assert(r.where($"n_pairs" < 24).count() == 0,
      "a month of hourly buckets must yield many lag-24 pairs")
  }

  test("q_conversion_latency: population and percentile ordering are sane") {
    import spark.implicits._
    val r = ops.Sessions.qConversionLatency(spark, sf).head()
    val n = r.getAs[Long]("n_converted")
    assert(n > 0, "fixture has converting users")
    assert(r.getAs[Double]("median_s") >= 0)
    assert(r.getAs[Double]("p90_s") >= r.getAs[Double]("median_s"))
    val users = tables.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(n <= users)
  }

  test("q_wow_growth: growth reconciles with the weekly counts") {
    import spark.implicits._
    val r = ops.Sessions.qWowGrowth(spark, sf)
    assert(r.count() > 0)
    // growth_ppm recomputed from the emitted counts must match: we carry
    // c but not prev, so rebuild prev via lag over the output itself
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"week")
    val chk = r.withColumn("prev_c", lag($"c", 1).over(w))
    val bad = chk.where($"prev_c".isNotNull &&
      $"growth_ppm" =!= expr("(c - prev_c) * 1000000 DIV prev_c")).count()
    assert(bad == 0)
    assert(r.where($"week" <= 0).count() == 0, "week 0 has no predecessor")
  }

  test("q_window_dedup: survivors partition the events, one per key-window") {
    import spark.implicits._
    val r = ops.Sessions.qWindowDedup(spark, sf)
    val events = tables.Tables.events(spark, sf).count()
    assert(r.agg(sum($"n_in_window")).head.getLong(0) == events,
      "window populations must cover every event exactly once")
    assert(r.where($"wstart" % 600 =!= 0).count() == 0, "10-min alignment")
    // survivor really is the window's earliest event id at the min second
    assert(r.groupBy($"user_id", $"event_type", $"wstart").count()
      .where($"count" > 1).count() == 0, "one survivor per key-window")
  }

  test("q_stream_late_data matches a driver-side watermark replay") {
    val r = rows(Sessions.qStreamLateData(spark, sf))
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4)))).toMap
    assert(r.nonEmpty)
    // replay: arrival = event time + md5(event_id)-derived delay (< 30
    // min); per event_type in arrival order, a row is late when it lags
    // the running max event time by > 10 min
    def jitterS(eventId: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(eventId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 1800L
    }
    val ev = rows(graft.tables.Tables.events(spark, sf)
        .selectExpr("event_type", "event_id", "unix_micros(ts) AS tu"))
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val naive = ev.groupBy(_._1).map { case (et, xs) =>
      val sorted = xs
        .sortBy(e => (e._3 + jitterS(e._2) * 1000000L, e._2)).map(_._3)
      var runMax = Long.MinValue
      var nLate = 0L
      var maxLate = 0L
      sorted.foreach { tu =>
        if (runMax != Long.MinValue && runMax - tu > 600000000L) {
          nLate += 1; maxLate = maxLate.max(runMax - tu)
        }
        runMax = runMax.max(tu)
      }
      et -> ((sorted.size.toLong, nLate, maxLate / 1000000L))
    }
    assert(r.keySet == naive.keySet)
    naive.foreach { case (et, (n, nLate, maxSec)) =>
      val (rn, rLate, frac, rMaxSec) = r(et)
      assert(rn == n && rLate == nLate && rMaxSec == maxSec, s"$et")
      assert(math.abs(frac - nLate.toDouble / n) < 5e-5)
    }
    // the watermark would drop SOMETHING at this sf — the test is vacuous
    // otherwise (the generator emits out-of-order events)
    assert(naive.valuesIterator.map(_._2).sum > 0L)
  }

  test("q_rolling_median matches a driver-side frame replay") {
    import org.apache.spark.sql.functions.{col, lit, sum, to_date}
    val r = rows(Sessions.qRollingMedian(spark, sf))
      .map(x => (x.getLong(0), x.getDate(1).toString) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r.nonEmpty)
    val daily = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_suppkey").as("s"), to_date(col("l_shipdate")).as("d"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount").cast("decimal(18,2)"))) * 10000)
        .cast("long").as("u"))
      .collect().map(x => (x.getLong(0), x.getDate(1).toString, x.getLong(2)))
    val naive = daily.groupBy(_._1).flatMap { case (s, xs) =>
      val sorted = xs.sortBy(_._2)
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        val n = frame.length
        val med = if (n % 2 == 1) frame(n / 2).toDouble
          else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        (s, sorted(i)._2) -> ((n.toLong, med))
      }
    }
    assert(r.keySet == naive.keySet)
    naive.foreach { case (k, v) => assert(r(k) == v, s"$k: ${r(k)} != $v") }
  }

  test("q_attribution matches a driver-side last-touch replay") {
    val r = rows(Sessions.qAttribution(spark, sf))
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r.nonEmpty)
    val ev = rows(graft.tables.Tables.events(spark, sf)
        .selectExpr("user_id", "event_id", "event_type",
          "CAST(floor(CAST(ts AS DOUBLE)) AS LONG) AS tsec",
          "CAST(value AS DECIMAL(18,2)) AS v"))
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3),
        x.getDecimal(4)))
    val attributed = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(e => (e._4, e._2))
      var lastTouch: Option[(Long, String)] = None
      sorted.flatMap { case (_, _, et, tsec, v) =>
        val out = if (et == "purchase") {
          val ch = lastTouch match {
            case Some((t, ty)) if tsec - t <= 7L * 86400L => ty
            case _ => "none"
          }
          Seq(ch -> v)
        } else Seq.empty
        if (et == "view" || et == "click") lastTouch = Some((tsec, et))
        out
      }
    }
    val naive = attributed.groupBy(_._1).map { case (ch, vs) =>
      ch -> ((vs.size.toLong,
        vs.map(v => BigDecimal(v._2)).sum.toDouble))
    }
    assert(r.keySet == naive.keySet)
    naive.foreach { case (ch, (n, rev)) =>
      assert(r(ch)._1 == n, s"$ch count")
      assert(math.abs(r(ch)._2 - rev) < 1e-6, s"$ch revenue")
    }
    // every purchase is attributed to exactly one bucket
    assert(r.valuesIterator.map(_._1).sum ==
      ev.count(_._3 == "purchase").toLong)
  }

  test("q_session_window partitions all events; windows respect the timeout") {
    val r = rows(Sessions.qSessionWindow(spark, sf))
    val nEvents = graft.tables.Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_events")).sum == nEvents,
      "session windows must partition every event")
    // per user: windows ordered, non-overlapping, end = last event + gap
    r.groupBy(_.getLong(0)).values.foreach { sessions =>
      val sorted = sessions.sortBy(_.getAs[Long]("session_start"))
      sorted.foreach { s =>
        assert(s.getAs[Long]("session_end") >= s.getAs[Long]("session_start") + 1800)
      }
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a.getAs[Long]("session_end") <= b.getAs[Long]("session_start"),
          "merged session windows must not overlap")
      }
    }
  }

  test("q_stream_join matches a driver-side interval replay") {
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(floor(CAST(ts AS DOUBLE)) AS LONG) AS tsec")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    val expect = (for {
      (u, pid, _, pt) <- purchases
      (cu, cid, _, ct) <- clicks
      if cu == u && ct <= pt && ct >= pt - 1800L
    } yield (u, pid, cid, pt, ct)).sortBy(t => (t._1, t._2, t._3))
    val got = rows(Sessions.qStreamJoin(spark, sf)).map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(got == expect.toSeq, s"got ${got.size} want ${expect.size}")
    assert(got.nonEmpty, "the horizon must match at least one pair at this sf")
  }

  // ---------------------------------------------------- round-9 additions

  private lazy val embRows: Seq[(Long, Int, IndexedSeq[Float])] =
    graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toIndexedSeq)).toSeq

  test("q_eval_ndcg matches an exact driver-side ranking replay") {
    val vecs = embRows.map { case (id, l, v) => (id, l, v.map(_.toDouble)) }
    def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: IndexedSeq[Double]): Double = math.sqrt(dot(a, a))
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    val expected = vecs.filter(_._1 < 10).sortBy(_._1).map { case (pid, pl, pv) =>
      val pn = nrm(pv)
      val ranked = vecs.filter(_._1 != pid)
        .map { case (id, l, v) => (id, l, dot(pv, v) / (pn * nrm(v))) }
        .sortBy { case (id, _, cos) => (-cos, id) }
      val nRel = ranked.count(_._2 == pl).toLong
      val dcg = ranked.take(10).zipWithIndex.collect {
        case ((_, l, _), i) if l == pl => 1.0 / log2(i + 2.0)
      }.sum
      val idcg = (1L to math.max(math.min(nRel, 10L), 1L))
        .map(i => 1.0 / log2(i + 1.0)).sum
      (pid, nRel, BigDecimal(dcg / idcg)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = rows(Eval.qEvalNdcg(spark, sf))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    // 0 is reachable (no relevant hit in the top-10), 1 is the ideal cap
    assert(got.forall { case (_, _, n) => n >= 0.0 && n <= 1.0 })
  }

  test("q_cohens_kappa matches the exact integer replay; bounded by [-1, 1]") {
    val preds = embRows.map { case (_, label, v) =>
      val mx = v.max
      val pos = v.indexWhere(_ == mx) // first max, 0-based = list_position-1
      (label.toLong, (pos % 10).toLong)
    }
    val n = preds.size.toLong
    val agree = preds.count { case (a, p) => a == p }.toLong
    val ca = preds.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cp = preds.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val peNum = (ca.keySet ++ cp.keySet).toSeq
      .map(c => ca.getOrElse(c, 0L) * cp.getOrElse(c, 0L)).sum
    val kappa = BigDecimal((n * agree - peNum).toDouble / (n * n - peNum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = rows(Eval.qCohensKappa(spark, sf)).head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((n, agree, kappa)))
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q_eval_calibration matches the exact micro-quantized replay") {
    val sy = embRows.map { case (_, label, v) =>
      (v.head.toDouble, if (label >= 5) 1L else 0L)
    }
    val mn = sy.map(_._1).min
    val mx = sy.map(_._1).max
    val binned = sy.map { case (s, y) =>
      val p = math.min(math.floor((s - mn) * 1000000.0 / (mx - mn)).toLong, 999999L)
      (p / 100000L, p, y)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (bin, xs) =>
      val n = xs.size.toLong
      val sumP = xs.map(_._2).sum
      val nPos = xs.map(_._3).sum
      val sq = xs.map { case (_, p, y) => val d = p - y * 1000000L; BigInt(d) * d }.sum
      (bin, n, nPos, r6(sumP.toDouble / (n * 1000000.0)),
        r6(nPos.toDouble / n), r6(sq.toDouble / (n.toDouble * 1.0e12)))
    }
    val got = rows(Eval.qEvalCalibration(spark, sf)).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got == expected)
    // predicted-probability bin means must sit inside their decile
    got.foreach { case (bin, _, _, meanP, fracPos, _) =>
      assert(meanP >= bin / 10.0 - 1e-6 && meanP <= (bin + 1) / 10.0 + 1e-6)
      assert(fracPos >= 0.0 && fracPos <= 1.0)
    }
  }

  test("q_kfold_split: md5 folds replay exactly; shares sum to 1 per lang") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def fold(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 5
    }
    val expected = docs.groupBy { case (id, lang) => (fold(id), lang) }.view
      .mapValues(_.size.toLong).toMap
    val got = rows(Eval.qKfoldSplit(spark, sf))
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == expected)
    // every fold present, and within each lang the shares sum to ~1
    assert(got.keySet.map(_._1) == Set(0L, 1L, 2L, 3L, 4L))
    rows(Eval.qKfoldSplit(spark, sf)).groupBy(_.getString(1)).foreach {
      case (lang, xs) =>
        val tot = xs.map(_.getDouble(3)).sum
        assert(math.abs(tot - 1.0) < 0.01, s"$lang fold shares sum to $tot")
    }
  }

  test("q_stream_enrich: totals reconcile with the direct join") {
    val got = rows(Sessions.qStreamEnrich(spark, sf))
    assert(got.nonEmpty)
    val joined = graft.tables.Tables.events(spark, sf)
      .join(graft.tables.Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
    assert(got.map(_.getLong(2)).sum == joined.count(),
      "windowed counts must cover every enriched event exactly once")
    val segs = joined.select("c_mktsegment").distinct().collect()
      .map(_.getString(0)).toSet
    assert(got.map(_.getString(1)).toSet == segs)
    // buckets are hour-aligned epochs
    assert(got.forall(_.getLong(0) % 3600 == 0))
  }

  test("q_twap matches an exact step-function integral replay") {
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id",
        "CAST(floor(CAST(ts AS DOUBLE)) AS LONG) AS tsec",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tend = ev.map(_._3).max
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, xs) =>
      val s = xs.sortBy(x => (x._3, x._2))
      val nxt = s.drop(1).map(_._3) :+ tend
      val num = s.zip(nxt).map { case ((_, _, t, v), n) => v * (n - t) }.sum
      val den = tend - s.head._3
      if (den > 0)
        Some((u, s.size.toLong, BigDecimal(num.toDouble / den / 100.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }
    val got = rows(Sessions.qTwap(spark, sf))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  private lazy val segDaily: Map[String, Seq[(Long, Long)]] = {
    val cust = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.tables.Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "datediff(o_orderdate, DATE'1995-01-01') AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c")
      .collect().map(r => (cust(r.getLong(0)), r.getInt(1).toLong, r.getLong(2)))
      .groupBy(_._1).view.mapValues { xs =>
        xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (d, ys) => (d, ys.map(_._3).sum) }
      }.toMap
  }

  test("q_trend_slope matches the exact-moments OLS replay") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = segDaily.toSeq.sortBy(_._1).map { case (seg, daily) =>
      val n = daily.size.toDouble
      val sx = daily.map(_._1).sum.toDouble
      val sy = daily.map(_._2).sum.toDouble
      val sxy = daily.map { case (x, y) => x * y }.sum.toDouble
      val sxx = daily.map { case (x, _) => x * x }.sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (seg, daily.size.toLong, r(slope / 100.0, 4),
        r((sy - slope * sx) / n / 100.0, 2))
    }
    val got = rows(Sessions.qTrendSlope(spark, sf))
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(got == expected)
  }

  test("q_drawdown matches the running-peak replay; ppm within [0, 1e6)") {
    val expected = segDaily.toSeq.sortBy(_._1).map { case (seg, daily) =>
      var peak = Long.MinValue
      var worst = 0L
      var maxPeak = 0L
      daily.foreach { case (_, rev) =>
        peak = math.max(peak, rev)
        maxPeak = math.max(maxPeak, peak)
        worst = math.max(worst, (peak - rev) * 1000000L / peak)
      }
      (seg, daily.size.toLong,
        BigDecimal(maxPeak.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, worst)
    }
    val got = rows(Sessions.qDrawdown(spark, sf))
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
    assert(got == expected)
    assert(got.forall(x => x._4 >= 0 && x._4 < 1000000L))
  }

  test("q_event_paths matches a driver-side triple replay") {
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "CAST(ts AS STRING) AS t", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { xs =>
      val s = xs.sortBy(x => (x._3, x._2)).map(_._4)
      s.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    val got = rows(Sessions.qEventPaths(spark, sf))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == expected)
    assert(got.nonEmpty && got.head._2 >= got.last._2)
  }

  test("q_seasonal_decompose: residuals sum to ~0; grid partitioned by dow") {
    val got = rows(Sessions.qSeasonalDecompose(spark, sf))
    assert(got.size == 7)
    // day-count conservation: the dow buckets partition the full day grid
    val days = graft.tables.Tables.orders(spark, sf)
      .selectExpr("datediff(o_orderdate, DATE'1995-01-01') AS d")
      .distinct().count()
    assert(got.map(_.getLong(1)).sum == days)
    // additive decomposition: count-weighted seasonal components of a
    // centered-MA detrend nearly cancel (edge windows break exactness)
    val weighted = got.map(r => r.getDouble(2) * r.getLong(1)).sum
    val scale = got.map(r => math.abs(r.getDouble(3))).max
    // loose: the sf0.001 day grid is sparse, so edge windows leave a
    // visible (but bounded) non-cancellation; sf0.01 parity is exact
    assert(math.abs(weighted) < scale * 0.15,
      s"weighted seasonal sum $weighted should be small vs trend $scale")
  }

  test("q_lead_lag matches an exact lag-scan replay; lag 0 is the peak") {
    val daily = segDaily.values.flatten
      .groupBy(_._1).toSeq.map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1)
    val counts = graft.tables.Tables.orders(spark, sf)
      .selectExpr("datediff(o_orderdate, DATE'1995-01-01') AS d")
      .collect().map(_.getInt(0).toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val revByDay = daily.toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (-7L to 7L).map { lag =>
      val pts = daily.flatMap { case (d, a) =>
        counts.get(d + lag).map(b => (a, b))
      }
      val n = pts.size.toDouble
      val sa = pts.map(_._1).sum.toDouble
      val sb = pts.map(_._2).sum.toDouble
      val sab = pts.map(p => p._1 * p._2).sum.toDouble
      val saa = pts.map(p => BigInt(p._1) * p._1).sum.toDouble
      val sbb = pts.map(p => p._2 * p._2).sum.toDouble
      val r = (n * sab - sa * sb) /
        (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
      (lag, pts.size.toLong, r6(r))
    }
    val got = rows(Sessions.qLeadLag(spark, sf))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    // same-day volume and revenue are most correlated at lag 0
    val best = got.maxBy(_._3)
    assert(best._1 == 0L, s"peak cross-correlation should sit at lag 0: $best")
  }

  test("q_burstiness matches the zero-inclusive Fano replay") {
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(floor(CAST(ts AS DOUBLE)) AS LONG) DIV 86400 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val span = ev.map(_._2).max - ev.map(_._2).min + 1
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val daily = xs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val s = daily.sum
      val sq = daily.map(c => c * c).sum
      (t, span, daily.size.toLong, s,
        r6((span.toDouble * sq - s.toDouble * s) / (span.toDouble * s)))
    }
    val got = rows(Sessions.qBurstiness(spark, sf)).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got == expected)
    assert(got.forall(_._5 >= 0.0))
  }

  test("q_mcnemar matches the exact discordant-pair replay") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val trips = embRows.map { case (_, label, v) =>
      val predA = (v.indexWhere(_ == v.max) % 10).toLong
      val head8 = v.take(8)
      val predB = (v.indexWhere(_ == head8.max) % 10).toLong
      (label.toLong, predA, predB)
    }
    val n = trips.size.toLong
    val ka = trips.count { case (a, pa, _) => pa == a }.toLong
    val kb = trips.count { case (a, _, pb) => pb == a }.toLong
    val b = trips.count { case (a, pa, pb) => pa == a && pb != a }.toLong
    val c = trips.count { case (a, pa, pb) => pa != a && pb == a }.toLong
    assert(b + c > 0)
    val z = math.max((math.abs((b - c).toDouble) - 1.0) / math.sqrt((b + c).toDouble), 0.0)
    val x = z / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.47047 * x)
    val p = t * (0.3480242 + t * (-0.0958798 + t * 0.7478556)) * math.exp(-x * x)
    val row = rows(Eval.qMcnemar(spark, sf)).head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n, b, c)))
    assert(row.getDouble(3) == r(ka.toDouble / n, 4))
    assert(row.getDouble(4) == r(kb.toDouble / n, 4))
    assert(row.getDouble(5) == r(z * z, 4))
    assert(row.getDouble(6) == r(p, 6))
  }

  test("q_isotonic_fit matches an independent sequential PAV; monotone; pools preserve mass") {
    // bins replayed exactly like the calibration replay, but over the
    // confidence-vs-correctness fixture
    val sy = embRows.map { case (_, label, v) =>
      val mx = v.max
      (mx.toDouble, if (v.indexWhere(_ == mx) % 10 == label) 1L else 0L)
    }
    val mn = sy.map(_._1).min
    val mx = sy.map(_._1).max
    val bins = sy.map { case (s, y) =>
      (math.min(math.floor((s - mn) * 1000000.0 / (mx - mn)).toLong, 999999L)
        / 100000L, y)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (bin, xs) => (bin, xs.size.toLong, xs.map(_._2).sum) }
    // classic pool-adjacent-violators — a genuinely DIFFERENT algorithm
    // from the query's minimax spelling; they must agree exactly
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    bins.foreach { case (_, n, pos) =>
      stack += ((pos, n, 1))
      while (stack.length > 1 && {
        val (p2, n2, _) = stack(stack.length - 2)
        val (p1, n1, _) = stack.last
        p2 * n1 > p1 * n2 // exact integer cross-multiplied violation test
      }) {
        val (p1, n1, w1) = stack.remove(stack.length - 1)
        val (p2, n2, w2) = stack.remove(stack.length - 1)
        stack += ((p1 + p2, n1 + n2, w1 + w2))
      }
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pav = stack.flatMap { case (pos, n, w) =>
      Seq.fill(w)(r6(pos.toDouble / n.toDouble))
    }.toSeq
    val got = rows(Eval.qIsotonicFit(spark, sf)).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1) == bins.map(_._1) && got.map(_._2) == bins.map(_._2),
      "bin layout must match the replay")
    assert(got.map(_._5) == pav,
      s"minimax fit must equal PAV: ${got.map(_._5)} vs $pav")
    // monotone non-decreasing, and each pooled block's rate equals the
    // mass-weighted average of the raw rates it covers (PAV invariant)
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("isotonic fit: empty interior bins (skewed scores) still pool exactly") {
    // scores leave deciles 1-2 and 4-8 EMPTY; the cumulative-below must
    // come from the greatest EXISTING bin, not a literal bin-1 lookup
    // (which would treat everything below bin 3 as mass 0 and corrupt
    // every interval rate starting there)
    import spark.implicits._
    val fixture = Seq(
      (0.05, 1L), (0.05, 1L), (0.06, 1L), (0.07, 0L), // bin 0: 3/4
      (0.35, 0L), (0.36, 0L), (0.37, 0L), (0.38, 1L), // bin 3: 1/4
      (0.95, 1L), (1.00, 1L)) // bin 9: 2/2
      .toDF("s", "y")
    val got = graft.ops.Eval.isotonicFitFromScores(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // PAV: 0.75 vs 0.25 violate -> pool to (3+1)/(4+4) = 0.5; 1.0 stands
    assert(got.toSeq == Seq(
      (0L, 4L, 3L, 0.75, 0.5), (3L, 4L, 1L, 0.25, 0.5),
      (9L, 2L, 2L, 1.0, 1.0)))
  }

  test("q_calibration_ece: scalar summary equals the reliability table's weighted gaps") {
    // ECE/MCE must be derivable from the q_eval_calibration table itself:
    // Σ (n_b/N)·gap_b quantized per bin, and max bin gap — recomputed here
    // from the UNROUNDED bin sums via the same replay fixture
    val s = embRows.map { case (_, label, v) => (v.head.toDouble, if (label >= 5) 1L else 0L) }
    val mn = s.map(_._1).min
    val mx = s.map(_._1).max
    val bins = s.map { case (x, y) =>
      (math.min(math.floor((x - mn) * 1000000.0 / (mx - mn)).toLong, 999999L), y)
    }.groupBy(_._1 / 100000L).toSeq.map { case (b, xs) =>
      (b, xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).sum)
    }
    val ct = s.size.toLong
    def quant(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val gaps = bins.map { case (_, n, sumP, nPos) =>
      (n, math.abs(sumP.toDouble / (n * 1000000.0) - nPos.toDouble / n))
    }
    val ece = gaps.map { case (n, g) => quant((n.toDouble / ct) * g) }.sum
    val mce = gaps.map { case (_, g) => quant(g) }.max
    val row = rows(Eval.qCalibrationEce(spark, sf)).head
    assert(row.getLong(0) == ct)
    assert(row.getDouble(1) == ece.toDouble / 1e6)
    assert(row.getDouble(2) == mce.toDouble / 1e6)
  }

  test("calibration ECE: constant-score corpus collapses to one bin, no ANSI error") {
    import spark.implicits._
    val fixture = Seq((0.7, 1L), (0.7, 1L), (0.7, 1L), (0.7, 0L), (0.7, 0L))
      .toDF("s", "y")
    val row = Eval.calibrationEceFromScores(fixture).head()
    // the degenerate grid maps every score to micro-prob 0, so the single
    // bin's gap is exactly the positive rate
    assert(row.getLong(0) == 5L)
    assert(row.getDouble(1) == 0.6)
    assert(row.getDouble(2) == 0.6)
  }

  test("q_isotonic_apply: every row carries its bin's fitted probability") {
    val fit = rows(Eval.qIsotonicFit(spark, sf))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(4))).toMap
    val applied = rows(Eval.qIsotonicApply(spark, sf))
    // one calibrated row per vec, and the per-bin row counts reproduce
    // the fitted table's bin masses exactly
    assert(applied.length == embRows.length)
    val binCounts = applied.groupBy(_.getLong(1)).view.mapValues(_.size.toLong)
    assert(binCounts.toMap == fit.view.mapValues(_._1).toMap,
      "apply must route every vec into the fitted bin layout")
    applied.foreach { r =>
      assert(r.getDouble(3) == fit(r.getLong(1))._2,
        s"cal_prob must equal the bin's fitted iso_prob: $r")
    }
    // calibration preserves the monotone order: higher bin, >= cal_prob
    val byBin = applied.map(r => (r.getLong(1), r.getDouble(3)))
      .distinct.sortBy(_._1)
    assert(byBin.map(_._2).sliding(2)
      .forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("isotonic fit: constant-score corpus degrades to one bin, no ANSI error") {
    import spark.implicits._
    val fixture = Seq.fill(3)((0.7, 1L)).++(Seq.fill(2)((0.7, 0L))).toDF("s", "y")
    val got = graft.ops.Eval.isotonicFitFromScores(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 5L, 3L, 0.6, 0.6)))
  }
}
