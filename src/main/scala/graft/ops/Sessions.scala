package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Event-time windowing & sessionization over the `events` table.
  *
  * The reference is batch-only (SURVEY.md §1: no DStream / Structured
  * Streaming usage) — this surface is net-new capability. The queries run in
  * batch mode here, but each uses the exact operator that works unchanged
  * under Structured Streaming (`window(ts, ...)` group keys); the streaming
  * wiring (readStream/writeStream/watermark) lives in
  * `graft.streaming.StreamingOps`.
  *
  * `events.ts` is ns in parquet and µs after Spark's read — all bucketing is
  * done on whole seconds (`floor(epoch)`) so results are identical for any
  * reader precision (SURVEY.md §7). `value` is money-like (2 decimals);
  * every sum casts it to DECIMAL(18,2) first so summation order can never
  * flip a rounded double (same determinism rule as the Relational money
  * aggregates).
  */
object Sessions {

  /** Tumbling 1-hour window per event type. `window()` is the streaming
    * group key; emitted as epoch seconds for engine-neutral comparison. */
  def qStreamTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp($"w.start").as("bucket_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"bucket_start", $"event_type")
  }

  val streamTumblingSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_start,
      |  event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin

  /** Sliding window: 1 hour long, sliding every 15 minutes — each event lands
    * in 4 overlapping windows (Spark expands via the Expand operator; the
    * oracle mirrors the same slide-alignment arithmetic). */
  def qStreamSliding(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp($"w.start").as("bucket_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"bucket_start", $"event_type")
  }

  val streamSlidingSql: String =
    """WITH e AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, event_type, value FROM events),
      |w AS (
      |  SELECT (t - t % 900) - 900 * u.i AS bucket_start, event_type, value
      |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) u)
      |SELECT bucket_start, event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin

  /** Batch twin of the STREAM-STREAM interval join
    * ([[graft.streaming.StreamingOps.clickPurchaseIntervalJoin]]): each
    * purchase matched to the same user's clicks in the preceding 30
    * minutes. Same dataflow shape as the streaming operator — an
    * EQUI-join on user_id with the time interval as a post-match
    * predicate (hash-partitionable; under streaming the two watermarks
    * bound the state store to the interval). Completes the streaming
    * family's batch-twin coverage: tumbling/sliding/session windows and
    * stream dedup already have gated twins, this gates the join. Times
    * compare on whole-second epochs (the ns-parquet vs µs-read rule). */
  def qStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .withColumn("tsec", floor($"ts".cast("double")).cast("long"))
    val clicks = e.where($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"tsec".as("click_sec"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"tsec".as("purchase_sec"))
    purchases.join(clicks, Seq("user_id"))
      .where($"click_sec" <= $"purchase_sec" &&
        $"click_sec" >= $"purchase_sec" - 1800L)
      .select($"user_id", $"purchase_id", $"click_id",
        $"purchase_sec", $"click_sec")
      .orderBy($"user_id", $"purchase_id", $"click_id")
  }

  val streamJoinSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events),
      |c AS (SELECT user_id, event_id AS click_id, tsec AS click_sec
      |      FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, tsec AS purchase_sec
      |      FROM e WHERE event_type = 'purchase')
      |SELECT user_id, purchase_id, click_id, purchase_sec, click_sec
      |FROM p JOIN c USING (user_id)
      |WHERE click_sec <= purchase_sec AND click_sec >= purchase_sec - 1800
      |ORDER BY user_id, purchase_id, click_id""".stripMargin

  /** Batch twin of the stream-STATIC enrichment join
    * ([[graft.streaming.StreamingOps.staticEnrich]]): each event enriched
    * with its user's market segment from the customer dimension, then the
    * tumbling 1-hour rollup per segment. The dimension side is explicitly
    * `broadcast()` — under streaming Spark re-plans it per micro-batch as
    * a batch relation, and at 100 TB the fact side never shuffles for the
    * enrich. Completes the streaming join-class coverage: stream-stream
    * (`q_stream_join`) and stream-static both gated. */
  def qStreamEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.customer(spark, sfDir).select($"c_custkey", $"c_mktsegment")
    Tables.events(spark, sfDir)
      .join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy(window($"ts", "1 hour").as("w"), $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp($"w.start").as("bucket_start"),
        $"c_mktsegment".as("segment"), $"n", $"sum_value")
      .orderBy($"bucket_start", $"segment")
  }

  val streamEnrichSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_start,
      |  c_mktsegment AS segment, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY bucket_start, segment""".stripMargin

  /** Time-weighted average of each user's event value — the TWAP/
    * time-weighted-balance operator every metering, billing, and position
    * pipeline needs: each observation holds until the next one (a step
    * function), so the average weights each value by its holding
    * duration, with the final value held to the global study end. A plain
    * `avg(value)` over irregular samples is biased toward busy periods —
    * this is the unbiased integral.
    *
    * Exactness: values quantized to exact integer cents through the
    * family's DECIMAL(18,2) cast, durations are integer seconds from the
    * portable epoch floor, so the Σ v·dt numerator and Σ dt denominator
    * are exact longs (v_c·dt ≤ 1e4·1e8 — widen to DECIMAL(38,0) past
    * ~10⁶-second spans at 9-figure cents); ONE double division ends it.
    * Ties on the same second break on event_id in BOTH engines, making
    * the step function's order — hence the 0-width segments — identical.
    * Scale shape: one user-partitioned lead window (bounded by events per
    * user), one hash aggregate, a 1-row broadcast study-end. */
  def qTwap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        floor($"ts".cast("double")).cast("long").as("tsec"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v_c"))
    val endRow = e.agg(max($"tsec").as("tend"))
    val w = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
    e.crossJoin(broadcast(endRow))
      .withColumn("nxt", coalesce(lead($"tsec", 1).over(w), $"tend"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"v_c" * ($"nxt" - $"tsec")).as("num"),
        sum($"nxt" - $"tsec").as("den"))
      .where($"den" > 0)
      .select($"user_id", $"n_events",
        round($"num".cast("double") / $"den" / 100.0, 4).as("twap"))
      .orderBy($"user_id")
  }

  val twapSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
      |  FROM events),
      |t AS (SELECT max(tsec) AS tend FROM e),
      |l AS (
      |  SELECT user_id, v_c, tsec,
      |    coalesce(lead(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id),
      |      tend) AS nxt
      |  FROM e CROSS JOIN t),
      |a AS (
      |  SELECT user_id, count(*) AS n_events,
      |    sum(v_c * (nxt - tsec)) AS num, sum(nxt - tsec) AS den
      |  FROM l GROUP BY 1)
      |SELECT user_id, n_events,
      |  round(CAST(num AS DOUBLE) / den / 100.0, 4) AS twap
      |FROM a WHERE den > 0 ORDER BY user_id""".stripMargin

  /** Group-wise OLS trend: per market segment, the least-squares slope
    * and intercept of daily order revenue against the day index — the
    * "is this segment growing, and how fast?" regression every revenue
    * dashboard fits, as a pure aggregation (no ML library, no iteration).
    *
    * Exactness: the five OLS moments (n, Σx, Σy, Σxy, Σx²) are exact
    * integer sums over the (segment, day)-bounded daily grid — x is the
    * epoch-day index, y exact cents through the DECIMAL(18,2) cast. The
    * Σxy accumulation is widened to DECIMAL(38,0)/HUGEINT (per-day x·y
    * stays under 2^63, but the SUM passes it around 100× this revenue
    * scale — Spark's long sum overflows while DuckDB's
    * HUGEINT stays exact, so the engines would diverge); the closed-form
    * slope/intercept assembly happens in doubles with identical op order
    * on both engines, `+ 0.0`-normalized so a flat segment's
    * barely-negative slope can't diverge as -0.0 vs 0.0 in the
    * string-compared parity gate. Scale shape: one fact aggregate to the
    * daily grid, one grid aggregate — corpus size only enters map-side. */
  def qTrendSlope(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("segment"),
        Epoch.day($"o_orderdate").as("x"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y_c"))
      .groupBy($"segment", $"x").agg(sum($"y_c").as("y"))
    daily.groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .select($"segment", $"n".as("n_days"),
        (round(
          (($"n".cast("double") * $"sxy".cast("double")
              - $"sx".cast("double") * $"sy")
            / ($"n".cast("double") * $"sxx" - $"sx".cast("double") * $"sx"))
            / 100.0, 4) + 0.0).as("slope_per_day"),
        (round(
          ($"sy".cast("double")
            - (($"n".cast("double") * $"sxy".cast("double")
                - $"sx".cast("double") * $"sy")
              / ($"n".cast("double") * $"sxx" - $"sx".cast("double") * $"sx"))
              * $"sx") / $"n" / 100.0, 2) + 0.0).as("intercept"))
      .orderBy($"segment")
  }

  val trendSlopeSql: String =
    """WITH daily AS (
      |  SELECT c_mktsegment AS segment,
      |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT segment, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(x * x) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT segment, CAST(n AS BIGINT) AS n_days,
      |  round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) / 100.0, 4)
      |    + 0.0 AS slope_per_day,
      |  round((CAST(sy AS DOUBLE)
      |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * sy)
      |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
      |    / n / 100.0, 2) + 0.0 AS intercept
      |FROM m ORDER BY segment""".stripMargin

  /** Maximum drawdown of each segment's daily revenue series — the
    * largest peak-to-current decline relative to the running peak, the
    * standard worst-slump risk metric. Computed entirely in integers:
    * running peak cents via a prefix max, per-day decline as a
    * cross-multiplied ppm integer division, one max.
    *
    * Scale shape: one fact aggregate to the (segment, day) grid, a
    * segment-partitioned running-max window over the day-domain-bounded
    * grid, one aggregate. */
  def qDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("segment"),
        Epoch.day($"o_orderdate").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("rev_c"))
      .groupBy($"segment", $"day").agg(sum($"rev_c").as("rev_c"))
    val w = Window.partitionBy($"segment").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak_c", max($"rev_c").over(w))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_days"),
        round(max($"peak_c").cast("double") / 100.0, 2).as("peak_rev"),
        // HUGEINT/DECIMAL widening: daily cents pass ~9e12 once corpus
        // revenue does, and (peak-rev)*1e6 then overflows the long on Spark
        // while DuckDB errors on the BIGINT multiply
        max(expr("CAST((CAST(peak_c AS DECIMAL(38,0)) - rev_c) * 1000000" +
          " DIV peak_c AS BIGINT)")).as("max_drawdown_ppm"))
      .orderBy($"segment")
  }

  val drawdownSql: String =
    """WITH daily AS (
      |  SELECT c_mktsegment AS segment,
      |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT segment, rev_c,
      |    max(rev_c) OVER (PARTITION BY segment ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
      |  FROM daily)
      |SELECT segment, count(*) AS n_days,
      |  round(CAST(max(peak_c) AS DOUBLE) / 100.0, 2) AS peak_rev,
      |  CAST(max((CAST(peak_c AS HUGEINT) - rev_c) * 1000000 // peak_c)
      |    AS BIGINT) AS max_drawdown_ppm
      |FROM p GROUP BY segment ORDER BY segment""".stripMargin

  /** Top event paths — 3-step behavioral path mining: each user's
    * consecutive event-type triples (ordered by time, event_id
    * tie-break), counted corpus-wide, top-20. The n-step generalization
    * of [[qEventTransitions]]' first-order Markov matrix — the "what do
    * users actually DO" sankey feed.
    *
    * Scale shape: one user-partitioned double-lead window (bounded by
    * events per user), a types³-bounded hash aggregate, and a
    * TakeOrderedAndProject cut. */
  def qEventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("s2", lead($"event_type", 1).over(w))
      .withColumn("s3", lead($"event_type", 2).over(w))
      .where($"s2".isNotNull && $"s3".isNotNull)
      .select(concat_ws(">", $"event_type", $"s2", $"s3").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(20)
  }

  val eventPathsSql: String =
    """WITH l AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w AS s2, lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || s2 || '>' || s3 AS path, count(*) AS n
      |FROM l WHERE s2 IS NOT NULL AND s3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** Trend + day-of-week seasonal decomposition of daily revenue — the
    * STL-style additive split every ops dashboard wants: trend is a
    * centered 7-day moving average, the seasonal component is each
    * weekday's mean detrended residual.
    *
    * Exactness: daily revenue is exact cents; the centered window keeps
    * (sum, n) instead of dividing, and each day's residual
    * rev − sum/n = (rev·n − sum)/n is cleared of its denominator by
    * scaling with 420/n (420 = lcm(4..7) covers the edge windows), so
    * the per-weekday accumulation is an exact integer sum, WIDENED to
    * DECIMAL(38,0) on the Spark side (per-day r420 terms stay under
    * 2^63 but their SUM passes it at ~100× this revenue scale — the
    * oracle's HUGEINT sum is already exact there, so an unwidened Spark
    * long sum would overflow and diverge); division and the one
    * double appear only in the 7-row final projection, with the
    * seasonal component `+ 0.0`-normalized on both engines (weekday
    * residual means sit near zero BY CONSTRUCTION, and a tiny negative
    * mean rounds to -0.0 on DuckDB vs +0.0 on Spark — a hard fail in
    * the string-compared parity gate). Scale
    * shape: one fact aggregate to the day grid; the centered ROWS window
    * is spelled as TWO lookups into [[Dist.withPrefix]]'s distributed
    * cumulative sum (c[min(i+3, n−1)] − pre[max(i−3, 0)]) joined by row
    * index — the family's no-unpartitioned-window discipline — then one
    * 7-key aggregate. */
  def qSeasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .select(
        Epoch.day($"o_orderdate").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("rev_c"))
      .groupBy($"day").agg(sum($"rev_c").as("rev_c"))
    // the prefix grid fans out to THREE consumers (hi lookup, lo lookup,
    // the max-index row) — checkpoint it so the zipWithIndex row ids are
    // assigned ONCE; a recompute under a different range partitioning
    // would hand the three branches inconsistent indexes
    val g = Dist.withPrefix(daily, Seq($"day"), Seq("rev_c" -> "pre"), Some("idx"))
      .withColumn("cum", $"pre" + $"rev_c")
      .localCheckpoint(true)
    val hi = g.select($"idx".as("hi_i"), $"cum".as("hi_cum"))
    val lo = g.select($"idx".as("lo_i"), $"pre".as("lo_pre"))
    g.crossJoin(broadcast(g.agg(max($"idx").as("mx"))))
      .withColumn("hi_i", least($"idx" + 3L, $"mx"))
      .withColumn("lo_i", greatest($"idx" - 3L, lit(1L))) // idx is 1-based
      .join(hi, "hi_i").join(lo, "lo_i")
      .withColumn("tsum", $"hi_cum" - $"lo_pre")
      .withColumn("tn", $"hi_i" - $"lo_i" + 1L)
      // residual cleared to integers: (rev·n − sum) · (420 / n)
      .withColumn("r420", ($"rev_c" * $"tn" - $"tsum") * expr("420 DIV tn"))
      .groupBy(pmod($"day", lit(7L)).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        (round(sum($"r420".cast("decimal(38,0)")).cast("double")
          / (lit(420.0) * count(lit(1))) / 100.0, 4) + 0.0).as("seasonal"),
        round(avg($"tsum".cast("double") / $"tn") / 100.0, 2).as("mean_trend"))
      .orderBy($"dow")
  }

  val seasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day, rev_c,
      |    sum(rev_c) OVER w AS tsum, count(*) OVER w AS tn
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
      |SELECT day % 7 AS dow, count(*) AS n_days,
      |  round(CAST(sum((rev_c * tn - tsum) * (420 // tn)) AS DOUBLE)
      |    / (420.0 * count(*)) / 100.0, 4) + 0.0 AS seasonal,
      |  round(avg(CAST(tsum AS DOUBLE) / tn) / 100.0, 2) AS mean_trend
      |FROM t GROUP BY 1 ORDER BY dow""".stripMargin

  /** Lead-lag cross-correlation scan: Pearson r between daily revenue
    * and daily order VOLUME at every shift in ±7 days — "does volume
    * lead value?" — the lag-scan generalization of
    * [[qHourlyAutocorr]]'s single fixed lag.
    *
    * Exactness: both series are exact integers on the day grid (cents,
    * counts); per-lag moments are exact sums, with Σa, Σa², Σab and Σb²
    * widened to DECIMAL(38,0)/HUGEINT on the OPERAND — the cast must sit
    * on the factor, not the finished product: `(a*a).cast(decimal)`
    * overflows the long multiply BEFORE widening once daily cents pass ~3e9
    * (and DuckDB hard-errors the same BIGINT multiply), which is exactly
    * the silent-divergence class the widening exists to prevent — and
    * each lag's r is one double assembly, round 6, `+ 0.0`-normalized on
    * both engines (a near-zero negative correlation must not diverge as
    * -0.0 vs 0.0 in the string-compared parity gate). Scale
    * shape: the lag dimension is a 15-row broadcast against the
    * calendar-bounded day grid, matched by a shifted-key equi-join (no
    * dense series materialized), then a 15-key aggregate. */
  def qLeadLag(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.orders(spark, sfDir)
      .select(
        Epoch.day($"o_orderdate").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("a"))
      .groupBy($"day").agg(sum($"a").as("a"), count(lit(1)).as("b"))
      .localCheckpoint(true)
    val lags = spark.range(-7, 8).select($"id".as("lag"))
    val shifted = g.select($"day".as("day2"), $"b".as("b2"))
    g.crossJoin(broadcast(lags))
      .join(shifted, $"day2" === $"day" + $"lag")
      .groupBy($"lag")
      .agg(count(lit(1)).as("n"),
        sum($"a".cast("decimal(38,0)")).as("sa"), sum($"b2").as("sb"),
        sum($"a".cast("decimal(38,0)") * $"b2").as("sab"),
        sum($"a".cast("decimal(38,0)") * $"a").as("saa"),
        sum($"b2".cast("decimal(38,0)") * $"b2").as("sbb"))
      .select($"lag", $"n".as("n_days"),
        (round(($"n".cast("double") * $"sab".cast("double")
            - $"sa".cast("double") * $"sb")
          / (sqrt($"n".cast("double") * $"saa".cast("double")
              - $"sa".cast("double") * $"sa".cast("double"))
            * sqrt($"n".cast("double") * $"sbb".cast("double")
              - $"sb".cast("double") * $"sb")),
          6) + 0.0).as("xcorr"))
      .orderBy($"lag")
  }

  val leadLagSql: String =
    """WITH g AS (
      |  SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS a,
      |    count(*) AS b
      |  FROM orders GROUP BY 1),
      |l AS (SELECT unnest(generate_series(-7, 7)) AS lag),
      |j AS (
      |  SELECT l.lag, g.a, s.b AS b2
      |  FROM g CROSS JOIN l JOIN g s ON s.day = g.day + l.lag),
      |m AS (
      |  SELECT lag, count(*) AS n, sum(a) AS sa, sum(b2) AS sb,
      |    sum(CAST(a AS HUGEINT) * b2) AS sab,
      |    sum(CAST(a AS HUGEINT) * a) AS saa,
      |    sum(CAST(b2 AS HUGEINT) * b2) AS sbb
      |  FROM j GROUP BY 1)
      |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
      |  round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
      |      - CAST(sa AS DOUBLE) * sb)
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
      |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
      |      * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
      |        - CAST(sb AS DOUBLE) * sb)),
      |  6) + 0.0 AS xcorr
      |FROM m ORDER BY lag""".stripMargin

  /** Burstiness of each event type's daily arrival counts — the Fano
    * factor (variance/mean index of dispersion): ≈1 reads Poisson,
    * ≫1 reads bursty/clumped, ≪1 regular — the one-number answer to
    * "can I capacity-plan this stream on its average rate?".
    *
    * Exactness: daily counts are exact integers over the (type, day)
    * grid — ABSENT days count as zero via the span (they are real
    * observations of zero arrivals; dropping them would bias the factor
    * down), cleared of division through cross-multiplied integer moments
    * (n·Σc² − (Σc)²) with one double division by n·Σc at the end. Scale
    * shape: one fact aggregate to the calendar-bounded grid, a 1-row
    * broadcast day-span, one type-bounded aggregate. */
  def qBurstiness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .select($"event_type",
        expr("CAST(floor(CAST(ts AS DOUBLE)) AS BIGINT) DIV 86400").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
    val span = daily.agg((max($"day") - min($"day") + 1L).as("n_days"))
    daily.groupBy($"event_type")
      .agg(count(lit(1)).as("active_days"), sum($"c").as("s"),
        // operand-widened: daily counts pass ~3e9/day at ~1000× fixture
        // event rates, where c² overflows the long sum on Spark
        // while the oracle's HUGEINT stays exact (the q_lead_lag class)
        sum($"c".cast("decimal(38,0)") * $"c").as("sq"))
      .crossJoin(broadcast(span))
      // zero days contribute 0 to s and sq; only n changes: n = n_days
      .select($"event_type", $"n_days", $"active_days", $"s".as("n_events"),
        // + 0.0: a constant daily series has fano = 0 exactly in integers
        // but the double assembly carries residue once sq passes 2^53 —
        // a tiny negative rounds to -0.0 on DuckDB vs +0.0 on Spark
        (round(($"n_days".cast("double") * $"sq".cast("double")
            - $"s".cast("double") * $"s")
          / ($"n_days".cast("double") * $"s"), 6) + 0.0).as("fano"))
      .orderBy($"event_type")
  }

  val burstinessSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT max(day) - min(day) + 1 AS n_days FROM daily),
      |g AS (
      |  SELECT event_type, count(*) AS active_days, sum(c) AS s,
      |    sum(CAST(c AS HUGEINT) * c) AS sq
      |  FROM daily GROUP BY 1)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(active_days AS BIGINT) AS active_days,
      |  CAST(s AS BIGINT) AS n_events,
      |  round((CAST(n_days AS DOUBLE) * CAST(sq AS DOUBLE)
      |      - CAST(s AS DOUBLE) * s)
      |    / (CAST(n_days AS DOUBLE) * s), 6) + 0.0 AS fano
      |FROM g CROSS JOIN span ORDER BY event_type""".stripMargin

  /** The ACTUAL `session_window` operator in the oracle gate:
    * [[qSessionize]] gates the lag+islands SPELLING of sessionization;
    * this query gates Spark's native session-window group key — the one
    * construct that runs unchanged under Structured Streaming with
    * merging session state ([[graft.streaming.StreamingOps]] uses it
    * with a watermark). Boundary semantics, established EMPIRICALLY
    * against sf0.1 (which contains an exact-timeout gap): an event
    * landing exactly at the previous session's end MERGES into it —
    * session_window treats the window as closed at [start, last+gap],
    * so a new session opens only when the gap is STRICTLY greater than
    * the 30-minute timeout. The oracle mirrors that `> 1800` boundary
    * (note [[qSessionize]]'s islands spelling happens to use the same
    * strict inequality); the window end is last-event + timeout.
    * Event times compare on whole seconds (the ns-parquet vs µs-read
    * rule); `timestamp_seconds` rebuilds a timestamp from the truncated
    * epoch so the operator sees second-aligned event time. */
  def qSessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("tsec", timestamp_seconds(floor($"ts".cast("double")).cast("long")))
      .groupBy($"user_id", session_window($"tsec", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select($"user_id",
        unix_timestamp($"w.start").as("session_start"),
        unix_timestamp($"w.end").as("session_end"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start")
  }

  val sessionWindowSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events),
      |g AS (
      |  SELECT *, tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS gap_s
      |  FROM e),
      |s AS (
      |  SELECT *, CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY tsec, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, min(tsec) AS session_start,
      |  max(tsec) + 1800 AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Sessionization: 30-minute-gap sessions per user via lag + cumulative
    * session counter — the batch formulation; `session_window(ts, '30 minutes')`
    * is the streaming-mode equivalent (see StreamingOps). */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("tsec", floor($"ts".cast("double")).cast("long"))
      .withColumn("gap_s", $"tsec" - lag($"tsec", 1).over(wOrd))
      .withColumn("new_s", when($"gap_s".isNull || $"gap_s" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_s").over(wCum))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"tsec").as("session_start"),
        (max($"tsec") - min($"tsec")).as("duration_s"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events),
      |g AS (
      |  SELECT *, tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS gap_s
      |  FROM e),
      |s AS (
      |  SELECT *, CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY tsec, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(tsec) AS session_start,
      |  max(tsec) - min(tsec) AS duration_s,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Funnel analysis over (user, day) sessions: ordered event sequences
    * matched against the view → click → purchase subsequence, with
    * per-stage counts and conversion rates. The per-session sequence is
    * built by sorting collected (tsec, event_id, event_type) structs —
    * whole-second time plus the unique event id gives a total order both
    * engines agree on (sub-second precision differs between the ns
    * parquet and Spark's µs read, so it never participates in ordering —
    * the same rule as [[qSessionize]]). Event-type names are not
    * substrings of each other, so the subsequence check is a plain regex
    * over the comma-joined sequence. Per-session state is bounded by a
    * user's daily activity; the final rollup is one row. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seqs = Tables.events(spark, sfDir)
      .withColumn("tsec", floor($"ts".cast("double")).cast("long"))
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(concat_ws(",",
        transform(
          array_sort(collect_list(struct($"tsec", $"event_id", $"event_type"))),
          s => s.getField("event_type"))).as("seq"))
    seqs.agg(
        count(lit(1)).as("n_sessions"),
        sum(when($"seq".rlike("view"), 1L).otherwise(0L)).as("stage_view"),
        sum(when($"seq".rlike("view.*click"), 1L).otherwise(0L)).as("stage_click"),
        sum(when($"seq".rlike("view.*click.*purchase"), 1L).otherwise(0L))
          .as("stage_purchase"))
      .select($"n_sessions", $"stage_view", $"stage_click", $"stage_purchase",
        round($"stage_click".cast("double") / $"stage_view", 4)
          .as("conv_view_click"),
        round($"stage_purchase".cast("double") / $"stage_click", 4)
          .as("conv_click_purchase"))
  }

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |seqs AS (
      |  SELECT user_id, day,
      |    string_agg(event_type, ',' ORDER BY tsec, event_id) AS seq
      |  FROM e GROUP BY 1, 2)
      |SELECT count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN regexp_matches(seq, 'view') THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
      |  CAST(sum(CASE WHEN regexp_matches(seq, 'view.*click') THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
      |  CAST(sum(CASE WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase,
      |  round(CAST(sum(CASE WHEN regexp_matches(seq, 'view.*click') THEN 1 ELSE 0 END) AS DOUBLE) /
      |        sum(CASE WHEN regexp_matches(seq, 'view') THEN 1 ELSE 0 END), 4) AS conv_view_click,
      |  round(CAST(sum(CASE WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 1 ELSE 0 END) AS DOUBLE) /
      |        sum(CASE WHEN regexp_matches(seq, 'view.*click') THEN 1 ELSE 0 END), 4) AS conv_click_purchase
      |FROM seqs""".stripMargin

  /** Cohort retention on purchase activity: users cohorted by their FIRST
    * purchase day, counted by distinct active purchase days at each offset
    * (≤ 7 days, cohorts from the first week of data — the window bound is
    * derived from the data's own min day via one broadcast row, never a
    * hard-coded date). The classic product-analytics retention matrix:
    * every step is a hash aggregation or a broadcast-bounded join. */
  def qCohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .select($"user_id", to_date($"ts").as("day"))
    // same shape as qCohortLtv: materialize the user-cardinality cohort
    // table, derive d0 from it — two event scans instead of three
    val c = p.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      .localCheckpoint(true)
    val m = c.agg(min($"cohort_day").as("d0"))
    p.join(c, "user_id")
      .select($"user_id", $"cohort_day",
        datediff($"day", $"cohort_day").cast("long").as("offset_d"))
      .distinct()
      .crossJoin(broadcast(m))
      .where($"offset_d" <= 7 && $"cohort_day" <= date_add($"d0", 7))
      .groupBy($"cohort_day", $"offset_d")
      .agg(count(lit(1)).as("users"))
      .orderBy($"cohort_day", $"offset_d")
  }

  val cohortRetentionSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM p GROUP BY 1),
      |m AS (SELECT min(day) AS d0 FROM p),
      |a AS (
      |  SELECT DISTINCT p.user_id, c.cohort_day,
      |    date_diff('day', c.cohort_day, p.day) AS offset_d
      |  FROM p JOIN c ON p.user_id = c.user_id)
      |SELECT cohort_day, offset_d, count(*) AS users
      |FROM a, m
      |WHERE offset_d <= 7 AND cohort_day <= d0 + 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-user activity streaks — the gap-and-islands shape: distinct active
    * days per user, islands found by the classic day-number-minus-row-number
    * trick, then per-user longest streak / streak count / active-day total.
    * Every window is partitioned by `user_id` (no global sort anywhere), and
    * the distinct + both aggregations all shuffle on user_id, so AQE
    * coalesces them into user-partitioned stages that scale with the user
    * population, not the event volume. */
  def qActivityStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wDay = Window.partitionBy($"user_id").orderBy($"day")
    val days = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    days
      .withColumn("grp",
        datediff($"day", to_date(lit("1970-01-01"))) - row_number().over(wDay))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(max($"len").as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum($"len").as("active_days"))
      .orderBy($"user_id")
  }

  val activityStreaksSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |r AS (
      |  SELECT user_id, day,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM d),
      |s AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |  count(*) AS n_streaks, CAST(sum(len) AS BIGINT) AS active_days
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Calendar gap-fill + last-observation-carried-forward — the time-series
    * resampling shape: per user, daily purchase revenue densified over the
    * user's own [first, last] purchase-day span via `sequence(... interval
    * 1 day)`, missing days zero-filled, plus an LOCF column carrying the
    * last observed day's revenue across gaps (`last(..., ignoreNulls)` over
    * a user-partitioned running frame). Revenue is summed in exact integer
    * cents (DECIMAL-widened before the ×100) so no engine's summation
    * order can flip a bit. Scale shape: the span explode fans out by
    * calendar days per user (bounded), the fill join is (user, day)-keyed,
    * and the LOCF window is partitioned by user — no global sort, no
    * unbounded state. */
  def qGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(($"value".cast("decimal(18,2)") * 100).cast("long")).as("cents"))
    val span = daily.groupBy($"user_id")
      .agg(min($"day").as("d_min"), max($"day").as("d_max"))
      .select($"user_id",
        explode(sequence($"d_min", $"d_max", expr("interval 1 day"))).as("day"))
    val wLocf = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    span.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"cents", lit(0L)).as("cents"),
        $"cents".isNotNull.as("observed"),
        last($"cents", ignoreNulls = true).over(wLocf).as("locf_cents"))
      .orderBy($"user_id", $"day")
  }

  /** SCD-type-2 historization (the warehouse dimension-versioning class):
    * each user's event-type change log becomes validity intervals
    * [valid_from, valid_to) with consecutive same-type runs collapsed —
    * the gaps-and-islands pattern (change flag via lag, run ids via
    * running sum, one group-by, valid_to via lead). Every window is
    * user-partitioned and the run relation is change-bounded, so state
    * per key is one user's history at any scale. Determinism: (tsec,
    * event_id) is a total order; the open interval of each user's last
    * run is NULL on both engines. */
  def qScd2Intervals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .where($"user_id" < 100)
      .select($"user_id", $"event_type", $"event_id",
        floor($"ts".cast("double")).cast("long").as("tsec"))
    val w = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
    val runs = e
      .withColumn("chg",
        when(!(lag($"event_type", 1).over(w) <=> $"event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum($"chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"run_id", $"event_type")
      .agg(min($"tsec").as("valid_from"), count(lit(1)).as("n_events"))
    runs
      .select($"user_id", $"event_type", $"valid_from",
        lead($"valid_from", 1)
          .over(Window.partitionBy($"user_id").orderBy($"valid_from"))
          .as("valid_to"),
        $"n_events")
      .orderBy($"user_id", $"valid_from")
  }

  val scd2IntervalsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events WHERE user_id < 100),
      |m AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |    THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
      |r AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tsec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      |  FROM m),
      |g AS (
      |  SELECT user_id, event_type, run_id,
      |    min(tsec) AS valid_from, count(*) AS n_events
      |  FROM r GROUP BY 1, 2, 3)
      |SELECT user_id, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
      |  n_events
      |FROM g ORDER BY user_id, valid_from""".stripMargin

  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id)
      |SELECT s.user_id, s.day,
      |  coalesce(d.n_events, 0) AS n_events,
      |  coalesce(d.cents, 0) AS cents,
      |  d.cents IS NOT NULL AS observed,
      |  last_value(d.cents IGNORE NULLS)
      |    OVER (PARTITION BY s.user_id ORDER BY s.day
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents
      |FROM span s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
      |ORDER BY s.user_id, s.day""".stripMargin

  /** Rolling anomaly detection: flag purchase events whose value sits more
    * than 3σ from the mean of the user's previous 4–7 purchases — the
    * standard streaming-QA shape (spend-spike / sensor-glitch detection),
    * here in its batch spelling.
    *
    * Determinism: values are exact centi-units (`value` is 2-decimal
    * money), and the 3σ test is cleared of divisions and square roots —
    *   (x − μ)² > 9σ²  ⟺  (n·x − s)² > 9·(n·Σx² − s²)
    * — so both sides are BIGINTs (bounded: n ≤ 7, x ≤ ~10⁵ centi-units →
    * every product < 2^45) and the flag is bit-identical on any engine.
    * Scale shape: one user-partitioned window sorted by (ts, event_id);
    * partition size is a user's event history, never the corpus. */
  def qRollingAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-7, -1)
    Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("x"))
      .select($"event_id", $"user_id", $"x",
        count($"x").over(w).as("n"),
        sum($"x").over(w).as("s"),
        sum($"x" * $"x").over(w).as("ss"))
      .where($"n" >= 4 &&
        ($"n" * $"x" - $"s") * ($"n" * $"x" - $"s") >
          lit(9L) * ($"n" * $"ss" - $"s" * $"s"))
      .select($"event_id", $"user_id", $"x".as("cents"), $"n".as("n_prev"))
      .orderBy($"event_id")
  }

  val rollingAnomalySql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT event_id, user_id, x,
      |    count(x) OVER win AS n,
      |    CAST(sum(x) OVER win AS BIGINT) AS s,
      |    CAST(sum(x * x) OVER win AS BIGINT) AS ss
      |  FROM p
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, x AS cents, n AS n_prev
      |FROM w
      |WHERE n >= 4 AND (n * x - s) * (n * x - s) > 9 * (n * ss - s * s)
      |ORDER BY event_id""".stripMargin

  /** Rolling EXACT median (7-day frame) of per-supplier daily revenue —
    * the robust-statistics twin of [[qRollingAnomaly]]'s mean/σ window:
    * median smoothing is what a production metrics pipeline runs when
    * spikes would poison a rolling mean.
    *
    * Determinism: daily revenue is summed exactly in DECIMAL then scaled
    * to integer 10⁻⁴-dollar units; the frame is ≤ 7 integers, so the
    * median is `sorted(k)` (odd) or `(sorted(k)+sorted(k+1))/2` (even) —
    * an integer or exact half in 10⁻⁴-dollar units, reported in those
    * units (a division back to dollars would hit 4-dp rounding ties on
    * non-representable doubles), identical to DuckDB's interpolated
    * `median()` over BIGINT. The frame sort key (day) is
    * unique per supplier (daily grain), so frames are identical sets on
    * both engines.
    *
    * Scale shape: Spark has no exact-median window aggregate — the
    * idiomatic spelling is `collect_list` over the CONSTANT-BOUNDED
    * 7-row frame + in-expression selection (never a corpus-wide sort);
    * one supplier-partitioned window after one hash aggregation. */
  def qRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy($"l_suppkey".as("suppkey"), to_date($"l_shipdate").as("day"))
      .agg((sum($"l_extendedprice".cast("decimal(18,2)")
          * (lit(1) - $"l_discount".cast("decimal(18,2)"))) * 10000)
        .cast("long").as("u"))
    val w = Window.partitionBy($"suppkey").orderBy($"day").rowsBetween(-6, 0)
    daily
      .withColumn("xs", array_sort(collect_list($"u").over(w)))
      .withColumn("n_frame", size($"xs").cast("long"))
      .withColumn("med_u",
        when($"n_frame" % 2 === 1,
          element_at($"xs", (($"n_frame" + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at($"xs", ($"n_frame" / 2).cast("int"))
            + element_at($"xs", ($"n_frame" / 2 + 1).cast("int"))) / 2.0))
      .select($"suppkey", $"day", $"n_frame", $"med_u".as("med_rev_u4"))
      .orderBy($"suppkey", $"day")
  }

  val rollingMedianSql: String =
    """WITH daily AS (
      |  SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS u
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT suppkey, day,
      |    CAST(count(*) OVER win AS BIGINT) AS n_frame,
      |    median(u) OVER win AS med_u
      |  FROM daily
      |  WINDOW win AS (PARTITION BY suppkey ORDER BY day
      |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT suppkey, day, n_frame, med_u AS med_rev_u4
      |FROM m ORDER BY suppkey, day""".stripMargin

  /** RFM segmentation: recency / frequency / monetary banding of the
    * purchase population — the classic behavioral-cohort cube. Bands are
    * fixed integer thresholds (not ntile), so no corpus-wide window is
    * needed and the result is partitioning-independent: recency vs the
    * corpus's last purchase date (≤2 d → 3, ≤7 d → 2, else 1), frequency
    * (≥16 → 3, ≥10 → 2, else 1), monetary exact cents (≥80 000 → 3,
    * ≥40 000 → 2, else 1).
    *
    * Scale shape: one user-keyed aggregation, one broadcast of the 1-row
    * corpus max date, one band-keyed rollup — 27 output cells max. */
  def qRfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val purchases = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
    val refDay = purchases.agg(max(to_date($"ts")).as("ref_day"))
    purchases
      .groupBy($"user_id")
      .agg(max(to_date($"ts")).as("last_day"),
        count(lit(1)).as("n_purchases"),
        sum(($"value".cast("decimal(18,2)") * 100).cast("long")).as("cents"))
      .crossJoin(broadcast(refDay))
      .select(
        when(datediff($"ref_day", $"last_day") <= 2, 3)
          .when(datediff($"ref_day", $"last_day") <= 7, 2).otherwise(1)
          .as("r_band"),
        when($"n_purchases" >= 16, 3).when($"n_purchases" >= 10, 2)
          .otherwise(1).as("f_band"),
        when($"cents" >= 80000L, 3).when($"cents" >= 40000L, 2)
          .otherwise(1).as("m_band"),
        $"cents")
      .groupBy($"r_band", $"f_band", $"m_band")
      .agg(count(lit(1)).as("n_users"), sum($"cents").as("sum_cents"))
      .orderBy($"r_band", $"f_band", $"m_band")
  }

  val rfmSegmentsSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (SELECT max(day) AS ref_day FROM p),
      |u AS (
      |  SELECT user_id, max(day) AS last_day, count(*) AS n_purchases,
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM p GROUP BY 1),
      |b AS (
      |  SELECT
      |    CASE WHEN date_diff('day', last_day, ref_day) <= 2 THEN 3
      |         WHEN date_diff('day', last_day, ref_day) <= 7 THEN 2
      |         ELSE 1 END AS r_band,
      |    CASE WHEN n_purchases >= 16 THEN 3 WHEN n_purchases >= 10 THEN 2
      |         ELSE 1 END AS f_band,
      |    CASE WHEN cents >= 80000 THEN 3 WHEN cents >= 40000 THEN 2
      |         ELSE 1 END AS m_band,
      |    cents
      |  FROM u, r)
      |SELECT r_band, f_band, m_band, count(*) AS n_users,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM b GROUP BY 1, 2, 3 ORDER BY r_band, f_band, m_band""".stripMargin

  /** First-order Markov transition matrix over each user's event stream:
    * counts and row-normalized probabilities of (prev_type → next_type) —
    * the session-modeling staple behind next-action prediction and
    * funnel-shape drift alerts.
    *
    * Determinism: transitions are integer counts; each probability is one
    * double division rounded to 6 dp. Scale shape: the lag rides a
    * user-partitioned window (partition = a user's history); the
    * transition relation is types²-bounded, so its row-total window is
    * constant-sized. */
  def qEventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wPrev = Window.partitionBy($"prev_type")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(wUser))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("prob",
        round($"c".cast("double") / sum($"c").over(wPrev), 6))
      .orderBy($"prev_type", $"next_type")
  }

  val eventTransitionsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS c
      |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, c,
      |  round(CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY prev_type), 6)
      |    AS prob
      |FROM c ORDER BY prev_type, next_type""".stripMargin

  /** Volume-burst detection: hourly event-type buckets whose count
    * exceeds 2× the mean of the 24 PRECEDING observed buckets — the
    * traffic-spike counterpart of [[qRollingAnomaly]]'s value spikes.
    *
    * Determinism: the 2× test is division-free (c·n > 2·s over exact
    * BIGINTs); the trailing frame is ROWS-based (24 preceding OBSERVED
    * buckets — engine-identical whatever the gaps). Scale shape: one
    * (type, hour) aggregation, then a type-partitioned window whose
    * partition is a type's hourly history — never the corpus. */
  def qVolumeBursts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"hr")
      .rowsBetween(-24, -1)
    Tables.events(spark, sfDir)
      .groupBy($"event_type",
        (unix_timestamp($"ts") / 3600).cast("long").as("hr"))
      .agg(count(lit(1)).as("c"))
      .select($"event_type", $"hr", $"c",
        count($"c").over(w).as("n_prev"),
        sum($"c").over(w).as("s"))
      .where($"n_prev" >= 12 && $"c" * $"n_prev" > lit(2L) * $"s")
      .select($"event_type", ($"hr" * 3600).as("hour_start"), $"c",
        $"n_prev", $"s".as("trailing_sum"))
      .orderBy($"event_type", $"hour_start")
  }

  val volumeBurstsSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hr, c,
      |    count(c) OVER win AS n_prev,
      |    CAST(sum(c) OVER win AS BIGINT) AS s
      |  FROM b
      |  WINDOW win AS (PARTITION BY event_type ORDER BY hr
      |                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hr * 3600 AS hour_start, c, n_prev,
      |  s AS trailing_sum
      |FROM w WHERE n_prev >= 12 AND c * n_prev > 2 * s
      |ORDER BY event_type, hour_start""".stripMargin

  /** Rolling 7-day active users (WAU) beside same-day actives (DAU) per
    * calendar day — THE engagement metric pair. Sliding distinct-count
    * has no algebraic combine, so it is spelled exactly: each distinct
    * (user, day) row replicates into the 7 windows it supports
    * (day..day+6), then one day-keyed COUNT DISTINCT — a 7× map-side
    * fan-out instead of a per-window rescan, and the standard exact
    * spelling at any scale.
    *
    * Scale shape: distinct (user, day) first (collapses the raw event
    * volume), ×7 explode, one aggregation; the max-day bound is a 1-row
    * broadcast. */
  def qRollingActives(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("oday")).distinct()
    val mx = ud.agg(max($"oday").as("mxd"))
    ud.select($"user_id", $"oday",
        explode(sequence(lit(0), lit(6))).as("off"))
      .select($"user_id", $"oday", date_add($"oday", $"off").as("day"))
      .crossJoin(broadcast(mx))
      .where($"day" <= $"mxd")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"),
        countDistinct(when($"oday" === $"day", $"user_id")).as("dau"))
      .orderBy($"day")
  }

  val rollingActivesSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS oday
      |  FROM events),
      |mx AS (SELECT max(oday) AS mxd FROM ud),
      |x AS (
      |  SELECT user_id, oday, oday + CAST(u.i AS INTEGER) AS day
      |  FROM ud, UNNEST(range(0, 7)) AS u(i))
      |SELECT day, count(DISTINCT user_id) AS wau,
      |  count(DISTINCT CASE WHEN oday = day THEN user_id END) AS dau
      |FROM x, mx WHERE day <= mxd
      |GROUP BY day ORDER BY day""".stripMargin

  /** Windowed first-event-wins dedup: one survivor per (user, type,
    * 10-minute tumbling window), earliest (ts, event_id) kept — the batch
    * oracle of streaming `dropDuplicates` within a watermark
    * ([[graft.streaming.StreamingOps]] runs the same semantics under
    * MemoryStream). Both engines spell the survivor via the identical
    * row_number window, so tie-breaks agree bit-for-bit.
    *
    * Scale shape: the window partitions on (user, type, bucket) — state
    * bounded by one key's activity inside 10 minutes, exactly the
    * streaming state-store bound. */
  def qWindowDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type", $"wstart")
      .orderBy($"tsec", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id",
        floor($"ts".cast("double")).cast("long").as("tsec"))
      .withColumn("wstart", $"tsec" - $"tsec" % 600)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_in_window",
        count(lit(1)).over(Window.partitionBy($"user_id", $"event_type", $"wstart")))
      .where($"rn" === 1)
      .select($"user_id", $"event_type", $"wstart",
        $"event_id".as("first_event_id"), $"n_in_window")
      .orderBy($"user_id", $"event_type", $"wstart")
  }

  val windowDedupSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events),
      |b AS (SELECT *, tsec - tsec % 600 AS wstart FROM e),
      |r AS (
      |  SELECT user_id, event_type, wstart, event_id,
      |    row_number() OVER (PARTITION BY user_id, event_type, wstart
      |                       ORDER BY tsec, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id, event_type, wstart)
      |      AS n_in_window
      |  FROM b)
      |SELECT user_id, event_type, wstart, event_id AS first_event_id,
      |  n_in_window
      |FROM r WHERE rn = 1
      |ORDER BY user_id, event_type, wstart""".stripMargin

  /** Cohort lifetime value: cumulative purchase revenue per first-purchase
    * cohort across day offsets 0–7, with per-user LTV — the money
    * companion of [[qCohortRetention]] (same cohort/offset frame, same
    * first-week bounds).
    *
    * Determinism: revenue is exact cents end-to-end; per-user LTV is
    * integer division of cents by the cohort's day-0 size. The cumulative
    * window partitions by cohort over ≤ 8 offset rows. */
  def qCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .select($"user_id", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    // the per-user cohort table (USER-cardinality — orders smaller than
    // the event stream it summarizes) is read three ways (join key,
    // cohort sizes, global d0); ReuseAudit measured four runtime event
    // scans without materialization. d0 = min over users' minima — the
    // same global minimum, exactly
    val c = p.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      .localCheckpoint(true)
    val m = c.agg(min($"cohort_day").as("d0"))
    val sizes = c.groupBy($"cohort_day").agg(count(lit(1)).as("cohort_users"))
    val wCum = Window.partitionBy($"cohort_day").orderBy($"offset_d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.join(c, "user_id")
      .select($"cohort_day",
        datediff($"day", $"cohort_day").cast("long").as("offset_d"), $"cents")
      .crossJoin(broadcast(m))
      .where($"offset_d" <= 7 && $"cohort_day" <= date_add($"d0", 7))
      .groupBy($"cohort_day", $"offset_d")
      .agg(sum($"cents").as("cents"))
      .withColumn("cum_cents", sum($"cents").over(wCum))
      .join(broadcast(sizes), "cohort_day")
      .select($"cohort_day", $"offset_d", $"cents", $"cum_cents",
        expr("cum_cents DIV cohort_users").as("ltv_cents_per_user"))
      .orderBy($"cohort_day", $"offset_d")
  }

  val cohortLtvSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM p GROUP BY 1),
      |m AS (SELECT min(day) AS d0 FROM p),
      |sz AS (SELECT cohort_day, count(*) AS cohort_users FROM c GROUP BY 1),
      |o AS (
      |  SELECT c.cohort_day,
      |    CAST(date_diff('day', c.cohort_day, p.day) AS BIGINT) AS offset_d,
      |    CAST(sum(p.cents) AS BIGINT) AS cents
      |  FROM p JOIN c ON p.user_id = c.user_id, m
      |  WHERE date_diff('day', c.cohort_day, p.day) <= 7
      |    AND c.cohort_day <= m.d0 + 7
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT cohort_day, offset_d, cents,
      |    CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY offset_d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_cents
      |  FROM o)
      |SELECT w.cohort_day AS cohort_day, offset_d, cents, cum_cents,
      |  cum_cents // cohort_users AS ltv_cents_per_user
      |FROM w JOIN sz ON w.cohort_day = sz.cohort_day
      |ORDER BY cohort_day, offset_d""".stripMargin

  /** Day-of-week seasonality profile per event type: each dow's share of
    * the type's events × 7 (1 000 000 ppm = perfectly uniform week).
    * The dow is computed portably as days-since-epoch mod 7 (0 =
    * Thursday) — engine date functions disagree on week origin, integer
    * arithmetic does not. One aggregation, types×7 output. */
  def qDowProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wType = Window.partitionBy($"event_type")
    Tables.events(spark, sfDir)
      .select($"event_type",
        (datediff(to_date($"ts"), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("dow"))
      .groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("c"))
      .withColumn("index_ppm",
        expr("c * 7000000 DIV (CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT))"))
      .orderBy($"event_type", $"dow")
  }

  val dowProfileSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01') % 7
      |      AS BIGINT) AS dow
      |  FROM events),
      |c AS (SELECT event_type, dow, count(*) AS c FROM e GROUP BY 1, 2)
      |SELECT event_type, dow, c,
      |  c * 7000000 // CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
      |    AS index_ppm
      |FROM c ORDER BY event_type, dow""".stripMargin

  /** Lag-24 h autocorrelation of hourly event volume per type — the
    * one-number daily-seasonality detector. Hourly counts pair with their
    * 24-hours-earlier bucket by an equi-join on the shifted hour key (no
    * dense series needed); all five Pearson sums are exact integers with
    * the second moments widened to DECIMAL(38,0)/HUGEINT on the operand,
    * and the n·Σxy − Σx·Σy assembly kept exact in the SAME wide integer
    * type before its single double cast (the previous long assembly
    * wrapped silently on Spark once Σx·Σx passed 2^63 — total-events²
    * per type, reached around 1e10 events — while DuckDB's HUGEINT
    * stayed exact, so the engines would diverge instead of both staying
    * exact). The rounded r is `+ 0.0`-normalized on both engines (a
    * near-zero negative autocorrelation must not diverge as -0.0 vs 0.0
    * in the string-compared parity gate). */
  def qHourlyAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hc = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        (unix_timestamp($"ts") / 3600).cast("long").as("hr"))
      .agg(count(lit(1)).as("c"))
    val x = hc.select($"event_type", $"hr", $"c".as("x"))
    val y = hc.select($"event_type", ($"hr" + 24).as("hr"), $"c".as("y"))
    x.join(y, Seq("event_type", "hr"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
        sum($"y".cast("decimal(38,0)") * $"y").as("syy"),
        sum($"x".cast("decimal(38,0)") * $"y").as("sxy"))
      .select($"event_type", $"n".as("n_pairs"),
        (round(($"n" * $"sxy" - $"sx".cast("decimal(38,0)") * $"sy")
            .cast("double")
          / (sqrt(($"n" * $"sxx" - $"sx".cast("decimal(38,0)") * $"sx")
              .cast("double"))
            * sqrt(($"n" * $"syy" - $"sy".cast("decimal(38,0)") * $"sy")
              .cast("double"))), 6) + 0.0)
          .as("r_lag24"))
      .orderBy($"event_type")
  }

  val hourlyAutocorrSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT x.event_type, x.c AS x, y.c AS y
      |  FROM b x JOIN b y
      |    ON x.event_type = y.event_type AND x.hr = y.hr + 24),
      |s AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM j GROUP BY 1)
      |SELECT event_type, n AS n_pairs,
      |  round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |      * sqrt(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))), 6)
      |    + 0.0 AS r_lag24
      |FROM s ORDER BY event_type""".stripMargin

  /** Conversion latency: seconds from a user's first view to their first
    * purchase (users who purchased at or after their first view), with
    * exact interpolated median/p90 — the product-analytics number behind
    * "how long does conversion take".
    *
    * Determinism: latencies are whole-second BIGINTs; `percentile` and
    * DuckDB's `quantile_cont` share the same linear-interpolation
    * definition (the proven [[graft.ops.Analytics.qQuantiles]] mapping).
    * Scale shape: one user-keyed aggregation, one 1-row summary. */
  def qConversionLatency(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_type",
        floor($"ts".cast("double")).cast("long").as("tsec"))
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"tsec")).as("fv"),
        min(when($"event_type" === "purchase", $"tsec")).as("fp"))
      .where($"fv".isNotNull && $"fp".isNotNull && $"fp" >= $"fv")
      .select(($"fp" - $"fv").as("lat"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat, 0.5)"), 4).as("median_s"),
        round(expr("percentile(lat, 0.9)"), 4).as("p90_s"))
  }

  val conversionLatencySql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view'
      |        THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fv,
      |    min(CASE WHEN event_type = 'purchase'
      |        THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fp
      |  FROM events GROUP BY 1),
      |l AS (
      |  SELECT fp - fv AS lat FROM u
      |  WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv)
      |SELECT count(*) AS n_converted,
      |  round(quantile_cont(lat, 0.5), 4) AS median_s,
      |  round(quantile_cont(lat, 0.9), 4) AS p90_s
      |FROM l""".stripMargin

  /** Week-over-week volume growth per event type, in exact ppm: weeks are
    * whole 7-day blocks from the corpus's first day (calendar-agnostic,
    * engine-agnostic), growth = (c_w − c_prev)·10⁶ DIV c_prev via a
    * lag over the types×weeks-bounded relation. */
  def qWowGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d0 = Tables.events(spark, sfDir).agg(min(to_date($"ts")).as("d0"))
    val weekly = Tables.events(spark, sfDir)
      .crossJoin(broadcast(d0))
      .groupBy($"event_type",
        (datediff(to_date($"ts"), $"d0") / 7).cast("long").as("week"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"week")
    weekly
      .withColumn("prev", lag($"c", 1).over(w))
      .where($"prev".isNotNull)
      .select($"event_type", $"week", $"c",
        expr("(c - prev) * 1000000 DIV prev").as("growth_ppm"))
      .orderBy($"event_type", $"week")
  }

  val wowGrowthSql: String =
    """WITH d0 AS (
      |  SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0 FROM events),
      |w AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', d0, CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7
      |      AS BIGINT) AS week,
      |    count(*) AS c
      |  FROM events, d0 GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, week, c,
      |    lag(c) OVER (PARTITION BY event_type ORDER BY week) AS prev
      |  FROM w)
      |SELECT event_type, week, c, (c - prev) * 1000000 // prev AS growth_ppm
      |FROM l WHERE prev IS NOT NULL
      |ORDER BY event_type, week""".stripMargin

  /** Exponentially-weighted moving average of daily order revenue, reset
    * monthly (α = 0.3, "adjusted" normalization: s_t = Σ x_i·(1−α)^(t−i) /
    * Σ (1−α)^(t−i), the standard bias-corrected EWMA). The recursive
    * definition is non-associative, so the distributed spelling is the
    * closed form over two running window sums of (1−α)^(−i)-weighted
    * terms — the (1−α)^t scale factor cancels in the ratio, so the weights
    * stay bounded by (1−α)^(−31) ≈ 6·10⁴ within a month partition (the
    * monthly reset is exactly what bounds the weight range; an unbounded
    * series would overflow the trick).
    *
    * Determinism: daily revenue is an exact DECIMAL sum; the EWMA ratio is
    * double arithmetic over ≤31 bounded-weight terms, rounded to 2 dp —
    * fp divergence across engines is ~10⁻⁸, six orders under the rounding
    * step. Scale shape: one date-keyed aggregation, then windows
    * partitioned by month (≤31 rows each); nothing global. */
  def qEwmaDaily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val alpha = 0.3
    val daily = Tables.orders(spark, sfDir)
      .where(year($"o_orderdate") === 1996)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(12,2)")).as("revenue"))
      .withColumn("mon", trunc($"day", "month"))
    val w = Window.partitionBy($"mon").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("rn", row_number().over(
        Window.partitionBy($"mon").orderBy($"day")))
      .withColumn("wt", pow(lit(1 - alpha), -$"rn"))
      .withColumn("ewma", round(
        sum($"revenue".cast("double") * $"wt").over(w) /
          sum($"wt").over(w), 2))
      .select($"day",
        round($"revenue".cast("double"), 2).as("revenue"), $"ewma")
      .orderBy($"day")
  }

  val ewmaDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue,
      |    date_trunc('month', CAST(o_orderdate AS DATE)) AS mon
      |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1, 3),
      |rn AS (
      |  SELECT day, revenue, mon,
      |    power(0.7, -row_number() OVER (PARTITION BY mon ORDER BY day)) AS wt
      |  FROM daily)
      |SELECT day, round(CAST(revenue AS DOUBLE), 2) AS revenue,
      |  round(sum(CAST(revenue AS DOUBLE) * wt)
      |          OVER (PARTITION BY mon ORDER BY day
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) /
      |        sum(wt)
      |          OVER (PARTITION BY mon ORDER BY day
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
      |    AS ewma
      |FROM rn ORDER BY day""".stripMargin

  /** Overlapping-interval merge (interval union) per supplier: each
    * lineitem contributes a deterministic handling window
    * [ship, ship + day%7 + 1 days]; overlapping AND touching windows
    * coalesce into maximal covered-day spans — the classic
    * gaps-and-islands coverage problem (machine-utilization /
    * SLA-coverage shape). A new island starts where the interval's start
    * leaves at least one uncovered day after the running max end of all
    * earlier intervals (st > pmax + 1); island ids are a running sum of
    * those flags, so a span is exactly a maximal run of covered days.
    *
    * Scale shape: both windows partition by s (supplier) — partition size
    * is a supplier's lineitem count, never corpus-global — and the final
    * rollup is one hash aggregation on s. Date arithmetic is exact
    * integer-day math end to end; no fp anywhere.
    *
    * Oracle note: the DuckDB side deliberately avoids window functions —
    * duckdb 1.0.0's parallel windowed MAX over many small partitions is
    * RUN-TO-RUN NONDETERMINISTIC at sf0.1 row counts (observed live:
    * identical SQL, different covered_days per run, while Spark matched
    * an independent ground-truth replay). The oracle instead explodes
    * each ≤8-day interval into covered days and counts distinct days
    * (coverage) and day-runs (spans) with plain joins/aggregates, which
    * is engine-robust — and is why the span semantic is day-contiguity,
    * the only island definition expressible without ordered windows. */
  def qIntervalMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val iv = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".as("s"), to_date($"l_shipdate").as("st"))
      .withColumn("en", date_add($"st",
        (pmod(datediff($"st", lit("1970-01-01").cast("date")), lit(7)) + 1)
          .cast("int")))
    val byStart = Window.partitionBy($"s").orderBy($"st", $"en")
    val prevMax = Window.partitionBy($"s").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, -1)
    iv
      .withColumn("pmax", max($"en").over(prevMax))
      .withColumn("new_island",
        when($"pmax".isNull || $"st" > date_add($"pmax", 1), 1L).otherwise(0L))
      .withColumn("island", sum($"new_island").over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"s", $"island")
      .agg(min($"st").as("span_start"), max($"en").as("span_end"))
      .groupBy($"s")
      .agg(count(lit(1)).as("n_spans"),
        sum(datediff($"span_end", $"span_start") + 1).as("covered_days"))
      .select($"s".as("suppkey"), $"n_spans", $"covered_days")
      .orderBy($"suppkey")
  }

  val intervalMergeSql: String =
    """WITH iv AS (
      |  SELECT l_suppkey AS s, CAST(l_shipdate AS DATE) AS st,
      |    CAST((CAST(l_shipdate AS DATE) - DATE '1970-01-01') % 7 + 1
      |      AS INTEGER) AS len
      |  FROM lineitem),
      |days AS (
      |  SELECT DISTINCT s, st + CAST(x.x AS INTEGER) AS d
      |  FROM iv, range(0, 8) x(x) WHERE x.x <= len)
      |SELECT a.s AS suppkey,
      |  CAST(sum(CASE WHEN p.d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_spans,
      |  CAST(count(*) AS BIGINT) AS covered_days
      |FROM days a LEFT JOIN days p ON p.s = a.s AND p.d = a.d - 1
      |GROUP BY 1 ORDER BY suppkey""".stripMargin

  /** Watermark late-data accounting — the batch twin of
    * `withWatermark("ts", "10 minutes")` drop semantics, run as a replay
    * harness: each event ARRIVES at its event time plus a deterministic
    * per-event network delay (md5-prefix of the event id, mod 30 min —
    * the generator emits events already time-ordered, so the delay
    * injection is what makes the replay exercise out-of-orderness; a
    * production run would use the real ingestion timestamp column).
    * Within each stream partition (event_type, the Kafka-partition
    * analog — Structured Streaming tracks per-partition watermarks and
    * takes the min), a row is LATE when its event time lags the running
    * max event time of previously-arrived rows by more than the
    * 10-minute delay. Reports, per partition, the rows the streaming job
    * would drop and the worst observed lateness — the dashboard that
    * sizes a production watermark.
    *
    * Determinism: the delay is the same 120-bit-family md5-prefix
    * arithmetic as the dedup digests (byte-identical on both engines);
    * everything else is integer microseconds over a total order
    * (arrival, event_id). Scale shape: ONE window sorted per partition
    * key (no global sort — mirroring per-partition stream ingestion),
    * then a hash aggregation down to |event_type| rows. */
  def qStreamLateData(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"atu", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select($"event_type", $"event_id", unix_micros($"ts").as("tu"))
      .withColumn("jit_s",
        Similarity.digest60($"event_id".cast("string")) % 1800)
      .withColumn("atu", $"tu" + $"jit_s" * 1000000L)
      .withColumn("pm", max($"tu").over(w))
      .withColumn("late_us", when($"pm" - $"tu" > 600000000L, $"pm" - $"tu"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        count($"late_us").as("n_late"),
        coalesce(max($"late_us"), lit(0L)).as("max_late_us"))
      .select($"event_type", $"n_events", $"n_late",
        round($"n_late".cast("double") / $"n_events", 4).as("late_frac"),
        expr("max_late_us DIV 1000000").as("max_late_sec"))
      .orderBy($"event_type")
  }

  val streamLateDataSql: String =
    """WITH b AS (
      |  SELECT event_type, event_id, epoch_us(ts) AS tu,
      |    epoch_us(ts) + (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
      |      % 1800) * 1000000 AS atu
      |  FROM events),
      |w AS (
      |  SELECT event_type, tu,
      |    max(tu) OVER (PARTITION BY event_type ORDER BY atu, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM b),
      |l AS (
      |  SELECT event_type, tu,
      |    CASE WHEN pm - tu > 600000000 THEN pm - tu END AS late_us
      |  FROM w)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(count(late_us) AS BIGINT) AS n_late,
      |  round(CAST(count(late_us) AS DOUBLE) / count(*), 4) AS late_frac,
      |  CAST(coalesce(max(late_us), 0) // 1000000 AS BIGINT) AS max_late_sec
      |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  /** Last-touch marketing attribution: every purchase is attributed to
    * the user's most recent prior view/click within a 7-day lookback
    * (the standard last-touch model); purchases with no touch in the
    * window land in the 'none' bucket. Reports per-channel purchase
    * counts and attributed revenue — the companion to [[qFunnel]]'s
    * stage conversion.
    *
    * Determinism: the carried last-touch is selected by the total order
    * (tsec, event_id) — whole seconds plus the unique id, the same rule
    * as [[qSessionize]]; revenue sums in DECIMAL(18,2) before the one
    * double cast. The Spark side carries ONE struct through
    * `last(ignoreNulls)` where the oracle carries two IGNORE-NULLS
    * last_value columns — identical row selection because both columns
    * are null on exactly the same rows.
    *
    * Scale shape: one window sorted per user (the natural stream
    * partitioning), then a hash aggregation down to ≤ 3 rows. No joins
    * at all — attribution as a pure window carry. */
  def qAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .withColumn("tsec", floor($"ts".cast("double")).cast("long"))
      .withColumn("touch",
        when($"event_type".isin("view", "click"),
          struct($"tsec".as("t_ts"), $"event_type".as("t_type"))))
      .withColumn("last_touch", last($"touch", ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .withColumn("channel",
        when($"last_touch".isNull
          || $"tsec" - $"last_touch.t_ts" > 7L * 86400L, "none")
          .otherwise($"last_touch.t_type"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy($"channel")
  }

  val attributionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events),
      |t AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type IN ('view', 'click') THEN tsec END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tsec, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_ts,
      |    last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tsec, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_type
      |  FROM e)
      |SELECT CASE WHEN t_ts IS NULL OR tsec - t_ts > 604800 THEN 'none'
      |            ELSE t_type END AS channel,
      |  count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_late_data" -> (qStreamLateData _),
    "q_attribution" -> (qAttribution _),
    "q_ewma_daily" -> (qEwmaDaily _),
    "q_interval_merge" -> (qIntervalMerge _),
    "q_wow_growth" -> (qWowGrowth _),
    "q_conversion_latency" -> (qConversionLatency _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_dow_profile" -> (qDowProfile _),
    "q_hourly_autocorr" -> (qHourlyAutocorr _),
    "q_rolling_actives" -> (qRollingActives _),
    "q_window_dedup" -> (qWindowDedup _),
    "q_volume_bursts" -> (qVolumeBursts _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_rfm_segments" -> (qRfmSegments _),
    "q_rolling_anomaly" -> (qRollingAnomaly _),
    "q_rolling_median" -> (qRollingMedian _),
    "q_gap_fill" -> (qGapFill _),
    "q_scd2_intervals" -> (qScd2Intervals _),
    "q_activity_streaks" -> (qActivityStreaks _),
    "q_stream_tumbling" -> (qStreamTumbling _),
    "q_stream_sliding" -> (qStreamSliding _),
    "q_stream_join" -> (qStreamJoin _),
    "q_stream_enrich" -> (qStreamEnrich _),
    "q_twap" -> (qTwap _),
    "q_trend_slope" -> (qTrendSlope _),
    "q_drawdown" -> (qDrawdown _),
    "q_event_paths" -> (qEventPaths _),
    "q_seasonal_decompose" -> (qSeasonalDecompose _),
    "q_lead_lag" -> (qLeadLag _),
    "q_burstiness" -> (qBurstiness _),
    "q_session_window" -> (qSessionWindow _),
    "q_funnel" -> (qFunnel _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_sessionize" -> (qSessionize _))

  val oracle: Map[String, String] = Map(
    "q_stream_late_data" -> streamLateDataSql,
    "q_attribution" -> attributionSql,
    "q_ewma_daily" -> ewmaDailySql,
    "q_interval_merge" -> intervalMergeSql,
    "q_wow_growth" -> wowGrowthSql,
    "q_conversion_latency" -> conversionLatencySql,
    "q_cohort_ltv" -> cohortLtvSql,
    "q_dow_profile" -> dowProfileSql,
    "q_hourly_autocorr" -> hourlyAutocorrSql,
    "q_rolling_actives" -> rollingActivesSql,
    "q_window_dedup" -> windowDedupSql,
    "q_volume_bursts" -> volumeBurstsSql,
    "q_event_transitions" -> eventTransitionsSql,
    "q_rfm_segments" -> rfmSegmentsSql,
    "q_rolling_anomaly" -> rollingAnomalySql,
    "q_rolling_median" -> rollingMedianSql,
    "q_gap_fill" -> gapFillSql,
    "q_scd2_intervals" -> scd2IntervalsSql,
    "q_activity_streaks" -> activityStreaksSql,
    "q_stream_tumbling" -> streamTumblingSql,
    "q_stream_sliding" -> streamSlidingSql,
    "q_stream_join" -> streamJoinSql,
    "q_stream_enrich" -> streamEnrichSql,
    "q_twap" -> twapSql,
    "q_trend_slope" -> trendSlopeSql,
    "q_drawdown" -> drawdownSql,
    "q_event_paths" -> eventPathsSql,
    "q_seasonal_decompose" -> seasonalDecomposeSql,
    "q_lead_lag" -> leadLagSql,
    "q_burstiness" -> burstinessSql,
    "q_session_window" -> sessionWindowSql,
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_sessionize" -> sessionizeSql)
}
