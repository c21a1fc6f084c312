package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming wiring for the event surface (SURVEY §2.B streaming
  * rows; the reference is batch-only — this is net-new capability).
  *
  * Every transform here takes a DataFrame that may be a `readStream` source
  * or a batch frame: the operators (`window`, `session_window`,
  * `withWatermark`, `dropDuplicatesWithinWatermark`) are the SAME plan
  * nodes either way — the batch-mode declared queries in
  * [[graft.ops.Sessions]] pin their semantics against DuckDB, and the
  * streaming suite drives these through a MemoryStream to prove they run
  * incrementally with state + watermark.
  *
  * Schema contract: an `events`-shaped frame
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string).
  */
object StreamingOps {

  /** Tumbling 1-hour counts/sums per event type with a watermark: late
    * events beyond `lateness` are dropped from state. */
  def tumblingCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour/15-minute windows per event type (each event lands in
    * 4 overlapping windows — Expand under the hood, identical to the batch
    * declared query). */
  def slidingCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("event_type"), col("n"))

  /** Session windows with a 30-minute inactivity gap per user — the
    * streaming-native equivalent of the batch lag+cumsum sessionization in
    * graft.ops.Sessions (state: one open session per user, closed by the
    * watermark). */
  def sessionAggregate(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup by content key within the watermark horizon —
    * the streaming face of graft.ml.Dedup.exact (state is bounded by the
    * watermark instead of growing forever). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-STATIC enrichment join + windowed rollup — the remaining join
    * class beside the stream-stream interval join: a streaming fact
    * enriched against a bounded dimension (here customer → market
    * segment). Spark plans the static side as an ordinary (broadcast-able)
    * batch relation re-read per micro-batch; no join state, no watermark
    * needed for the join itself — the watermark only bounds the windowed
    * aggregation state downstream. Batch twin: `q_stream_enrich`. */
  def staticEnrich(events: DataFrame, dim: DataFrame,
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"),
        col("c_mktsegment").as("segment"), col("n"))

  /** Stream-stream interval join: each purchase matched to the same user's
    * clicks in the preceding `horizon` — the streaming face of the batch
    * as-of/range joins (q_join_asof / q_join_range). Both sides carry
    * watermarks and the join condition bounds click_ts to a closed interval
    * before purchase_ts, so the state store evicts both sides' rows once
    * the watermark passes the interval — bounded state at any scale, and
    * the join itself is an equi-join on user_id with the time predicate
    * applied post-match (hash-partitionable, never nested-loop). */
  def clickPurchaseIntervalJoin(events: DataFrame,
      horizon: String = "30 minutes", lateness: String = "10 minutes"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Running (event_count, total_value) per user. */
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** [[runningUserTotals]]'s state logic on the Spark 4 `transformWithState`
    * v2 API: typed [[org.apache.spark.sql.streaming.ValueState]] from the
    * StatefulProcessorHandle instead of the GroupState closure. The v2
    * operator requires the RocksDB state store provider (changelog-
    * checkpointable, the store a 100 TB stateful job runs on anyway). */
  private class TotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserTotals] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}
    @transient private var totals: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
          .asInstanceOf[Encoder[(Long, Long)]],
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { r => n += 1; cents += r._2 }
      totals.update((n, cents))
      Iterator(UserTotals(key, n, cents / 100.0))
    }
  }

  /** Per-user running totals via `transformWithState` (Spark 4 stateful v2).
    * Same contract as [[runningUserTotals]]; callers must run with the
    * RocksDB state store provider. */
  def runningUserTotalsV2(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").cast("long"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TotalsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Custom stateful streaming op (SURVEY §2.B "stateful streaming" row):
    * per-user running counters via
    * `KeyValueGroupedDataset.flatMapGroupsWithState` — arbitrary state
    * (count + exact cents) carried across micro-batches, emitted in Update
    * mode each time a user's group receives events. The value accumulates
    * as integer cents so state is exact regardless of arrival order. */
  def runningUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r => n += 1; cents += r._2 }
          state.update((n, cents))
          Iterator(UserTotals(uid, n, cents / 100.0))
      }
  }
}
