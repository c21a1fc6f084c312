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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (qStreamTumbling _),
    "q_stream_sliding" -> (qStreamSliding _),
    "q_sessionize" -> (qSessionize _))

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" -> streamTumblingSql,
    "q_stream_sliding" -> streamSlidingSql,
    "q_sessionize" -> sessionizeSql)
}
