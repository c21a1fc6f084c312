package graft

import org.apache.spark.sql.SparkSession

/** Round-21 constant-floor profile (verdict item 8): ~235 of 282 queries
  * sit under 1.3 s at sf0.1 and the suite total is dominated by their
  * per-query constants. This main decomposes that constant for a sample
  * of queries: catalyst phase times (QueryPlanningTracker), Janino
  * compilation count/time deltas (CodegenMetrics), Spark job count, and
  * wall time — so "the floor is planning/codegen/scheduling" becomes a
  * measured table instead of a guess. Bench-like session config. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try graft.ops.Similarity.shinglePairStats(spark, sfDir).count()
    catch { case _: Throwable => }

    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgTime: Long = cg.METRIC_COMPILATION_TIME.getCount *
      cg.METRIC_COMPILATION_TIME.getSnapshot.getMean.toLong
    def cgCount: Long = cg.METRIC_COMPILATION_TIME.getCount

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val targets =
      if (args.nonEmpty) args.toIndexedSeq
      else all.map(_._1).zipWithIndex.collect {
        case (n, i) if i % 9 == 0 => n // ~31 queries spanning families
      }
    println("[floor] query, wall_s, analysis_ms, optimization_ms, " +
      "planning_ms, cg_compiles, cg_ms_apx, jobs")
    var agg = (0.0, 0L, 0L, 0L, 0L, 0L, 0L)
    targets.foreach { name =>
      val j0 = jobCount.get(); val c0 = cgCount; val ct0 = cgTime
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      try df.count() catch { case _: Throwable => }
      val wall = (System.nanoTime() - t0) / 1e9
      val ph = df.queryExecution.tracker.phases
      def ms(p: String): Long =
        ph.get(p).map(s => s.endTimeMs - s.startTimeMs).getOrElse(-1L)
      val row = (wall, ms("analysis"), ms("optimization"), ms("planning"),
        cgCount - c0, cgTime - ct0, jobCount.get() - j0)
      println(f"[floor] $name%-28s ${row._1}%6.2f ${row._2}%6d ${row._3}%6d " +
        f"${row._4}%6d ${row._5}%6d ${row._6}%6d ${row._7}%5d")
      agg = (agg._1 + row._1, agg._2 + math.max(0, row._2),
        agg._3 + math.max(0, row._3), agg._4 + math.max(0, row._4),
        agg._5 + row._5, agg._6 + row._6, agg._7 + row._7)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    println(f"[floor] TOTAL over ${targets.size} queries: wall ${agg._1}%.1f s, " +
      f"analysis ${agg._2} ms, optimization ${agg._3} ms, planning ${agg._4} ms, " +
      f"codegen ${agg._5} compiles ~${agg._6} ms, ${agg._7} jobs")
    spark.stop()
  }
}
