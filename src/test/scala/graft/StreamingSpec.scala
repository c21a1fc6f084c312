package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Event row for MemoryStream (top-level so the encoder generates static
  * accessors — a nested case class forces interpreted fallback). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Drives StreamingOps through a real incremental MemoryStream execution
  * (not batch mode): proves the window/session/watermark plans run under
  * the streaming engine with state. */
class StreamingSpec extends GraftSuite {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def runToCompletion(stream: MemoryStream[Ev],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      sinkName: String, mode: String): Unit = {
    val q = transform(stream.toDF())
      .writeStream.format("memory").queryName(sinkName).outputMode(mode).start()
    try { q.processAllAvailable() } finally q.stop()
  }

  test("tumblingCounts aggregates incrementally under the streaming engine") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, ts(5), 1, "click", 1.0, "{}"),
      Ev(2, ts(20), 1, "click", 2.0, "{}"),
      Ev(3, ts(70), 2, "view", 3.0, "{}"))
    runToCompletion(stream, StreamingOps.tumblingCounts(_), "tumbling", "append")
    // append mode emits only watermark-closed windows; push the watermark
    // forward with a late sentinel and re-run to completion.
    val stream2 = MemoryStream[Ev]
    stream2.addData(
      Ev(1, ts(5), 1, "click", 1.0, "{}"),
      Ev(2, ts(20), 1, "click", 2.0, "{}"),
      Ev(3, ts(70), 2, "view", 3.0, "{}"))
    val q = StreamingOps.tumblingCounts(stream2.toDF())
      .writeStream.format("memory").queryName("tumbling2").outputMode("append").start()
    q.processAllAvailable()
    stream2.addData(Ev(4, ts(200), 3, "click", 0.0, "{}")) // advances watermark past hour 0-1
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tumbling2").collect()
    val hour0click = out.find(r =>
      r.getAs[Timestamp]("bucket_start") == ts(0) &&
        r.getAs[String]("event_type") == "click").get
    assert(hour0click.getAs[Long]("n") == 2)
    assert(hour0click.getAs[Double]("sum_value") == 3.0)
  }

  test("clickPurchaseIntervalJoin matches clicks in the horizon, streams state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, ts(0), 1, "click", 0.0, "{}"),    // 40 min before -> outside horizon
      Ev(2, ts(25), 1, "click", 0.0, "{}"),   // 15 min before -> inside
      Ev(3, ts(35), 1, "click", 0.0, "{}"),   // 5 min before  -> inside
      Ev(4, ts(40), 1, "purchase", 9.0, "{}"),
      Ev(5, ts(30), 2, "click", 0.0, "{}"),   // other user -> must not match
      Ev(6, ts(90), 3, "click", 0.0, "{}"))   // advances both watermarks
    val q = StreamingOps.clickPurchaseIntervalJoin(stream.toDF())
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(Ev(7, ts(180), 3, "purchase", 1.0, "{}")) // close hour 0
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("interval_join").collect()
    val forP4 = out.filter(_.getAs[Long]("purchase_id") == 4L)
      .map(_.getAs[Long]("click_id")).sorted.toSeq
    assert(forP4 == Seq(2L, 3L),
      s"purchase 4 must join clicks 2,3 (in-horizon, same user): got $forP4")
    assert(!out.exists(r => r.getAs[Long]("user_id") == 2L),
      "cross-user rows must not appear")
  }

  test("sessionAggregate merges events within the gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamingOps.sessionAggregate(stream.toDF())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // user 1: events at 0 and 10 min (same session), then 60 min (new session)
    stream.addData(
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(2, ts(10), 1, "click", 2.0, "{}"),
      Ev(3, ts(60), 1, "click", 4.0, "{}"))
    q.processAllAvailable()
    stream.addData(Ev(9, ts(300), 9, "click", 0.0, "{}")) // close all sessions
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions").where($"user_id" === 1).collect()
    assert(out.length == 2, s"gap of 50min must split into 2 sessions, got ${out.length}")
    val first = out.minBy(_.getAs[Timestamp]("session_start").getTime)
    assert(first.getAs[Long]("n_events") == 2)
    assert(first.getAs[Double]("sum_value") == 3.0)
  }

  test("dedupWithinWatermark drops duplicate keys in-stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamingOps.dedupWithinWatermark(stream.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    stream.addData(
      Ev(1, ts(0), 1, "click", 1.0, "{}"),
      Ev(1, ts(1), 1, "click", 1.0, "{}"), // duplicate id
      Ev(2, ts(2), 1, "view", 2.0, "{}"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("runningUserTotals carries flatMapGroupsWithState state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamingOps.runningUserTotals(stream.toDF())
      .writeStream.format("memory").queryName("usertotals").outputMode("update").start()
    stream.addData(
      Ev(1, ts(0), 1, "click", 1.50, "{}"),
      Ev(2, ts(1), 1, "click", 2.25, "{}"))
    q.processAllAvailable()
    // second micro-batch: state must accumulate, not reset
    stream.addData(Ev(3, ts(2), 1, "click", 0.25, "{}"))
    q.processAllAvailable()
    q.stop()
    val updates = spark.table("usertotals").where($"user_id" === 1)
      .orderBy($"n_events").collect()
    assert(updates.last.getAs[Long]("n_events") == 3,
      "state must survive across micro-batches")
    assert(updates.last.getAs[Double]("total_value") == 4.0)
  }

  test("runningUserTotalsV2 (transformWithState) accumulates ValueState across batches") {
    implicit val sqlCtx = spark.sqlContext
    // the v2 stateful operator requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev]
      val q = StreamingOps.runningUserTotalsV2(stream.toDF())
        .writeStream.format("memory").queryName("usertotals_v2")
        .outputMode("update").start()
      stream.addData(
        Ev(1, ts(0), 1, "click", 1.50, "{}"),
        Ev(2, ts(1), 1, "click", 2.25, "{}"))
      q.processAllAvailable()
      stream.addData(Ev(3, ts(2), 1, "click", 0.25, "{}"))
      q.processAllAvailable()
      q.stop()
      val updates = spark.table("usertotals_v2").where($"user_id" === 1)
        .orderBy($"n_events").collect()
      assert(updates.last.getAs[Long]("n_events") == 3,
        "ValueState must survive across micro-batches")
      assert(updates.last.getAs[Double]("total_value") == 4.0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful v2 state survives checkpoint stop/restart (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    // the one streaming property the MemoryStream suites above don't
    // exercise: kill the query, start a NEW one on the same checkpoint,
    // and prove the RocksDB ValueState comes back — the recovery path a
    // production stateful job lives on.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart").toString
    try {
      val stream = MemoryStream[Ev]
      // the memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable sink, collecting updates into a driver-side queue
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
      def start() =
        StreamingOps.runningUserTotalsV2(stream.toDF())
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[StreamingOps.UserTotals], _: Long) =>
              df.collect().foreach(u =>
                got.add((u.user_id, u.n_events, u.total_value)))
          }
          .start()
      val q1 = start()
      stream.addData(
        Ev(1, ts(0), 1, "click", 1.50, "{}"),
        Ev(2, ts(1), 1, "click", 2.25, "{}"))
      q1.processAllAvailable()
      q1.stop()
      // new query, same checkpoint: committed offsets are not replayed, so
      // the only way the next update can emit (3, 4.0) is recovered state
      val q2 = start()
      stream.addData(Ev(3, ts(2), 1, "click", 0.25, "{}"))
      q2.processAllAvailable()
      q2.stop()
      val forUser1 = got.toArray(Array.empty[(Long, Long, Double)])
        .filter(_._1 == 1L).sortBy(_._2)
      assert(forUser1.last._2 == 3,
        "RocksDB ValueState must survive the stop/restart")
      assert(forUser1.last._3 == 4.0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("slidingCounts places each closed event in 4 overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamingOps.slidingCounts(stream.toDF())
      .writeStream.format("memory").queryName("sliding").outputMode("append").start()
    stream.addData(Ev(1, ts(30), 1, "click", 1.0, "{}"))
    q.processAllAvailable()
    stream.addData(Ev(2, ts(400), 2, "view", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val n = spark.table("sliding").where($"event_type" === "click").count()
    assert(n == 4, s"1h window / 15min slide => 4 windows per event, got $n")
  }

  test("staticEnrich joins the stream to a broadcast dimension, no join state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "AUTO"), (2L, "RETAIL")).toDF("c_custkey", "c_mktsegment")
    val stream = MemoryStream[Ev]
    val q = StreamingOps.staticEnrich(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      stream.addData(
        Ev(1, ts(5), 1, "click", 1.0, "{}"),
        Ev(2, ts(20), 1, "view", 2.0, "{}"),
        Ev(3, ts(30), 2, "click", 3.0, "{}"),
        Ev(4, ts(10), 9, "click", 4.0, "{}")) // no dim row -> dropped
      q.processAllAvailable()
      stream.addData(Ev(5, ts(200), 2, "click", 0.0, "{}")) // close hour 0
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("enrich").collect()
    val hour0 = out.filter(_.getAs[Timestamp]("bucket_start") == ts(0))
      .map(r => r.getAs[String]("segment") -> r.getAs[Long]("n")).toMap
    assert(hour0 == Map("AUTO" -> 2L, "RETAIL" -> 1L),
      s"hour-0 enriched counts per segment: $hour0")
    assert(!out.exists(_.getAs[Long]("n") > 3L), "unknown users must not join")
  }
}
