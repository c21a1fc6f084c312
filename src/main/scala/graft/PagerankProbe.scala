package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level breakdown of q_pagerank's edge build + dispatch + collect
  * (round-21 measurement instrument; same session config as Bench). */
object PagerankProbe {
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
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").count()
    Seq("lineitem", "supplier").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    if (args.contains("--plans")) {
      // the q_pagerank cost sits in the eagerly-built dispatch relation,
      // which the final plan (LocalTableScan) does not show — dump the
      // dispatch relation's plan for the before/after artifacts
      println("=== OLD dispatch relation (mirrored + outdeg window; " +
        "qPagerankEdgesForTests) ===")
      println(graft.ops.Analytics.qPagerankEdgesForTests(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("=== NEW dispatch relation (distinct half edges; " +
        "qPagerankHalfEdges) ===")
      println(graft.ops.Analytics.qPagerankHalfEdges(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("=== q_pagerank final plan ===")
      graft.ops.Analytics.qPagerank(spark, sfDir).explain("formatted")
      spark.stop()
      return
    }
    for (round <- 1 to 3) {
      println(s"[prp] --- round $round")
      val half = graft.tables.Tables.lineitem(spark, sfDir)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_suppkey")).as("ss"))
        .select(explode(call_function("graft_pairs", $"ss", lit(false))).as("e"))
        .select($"e.x", $"e.y").distinct()
      val nHalf = t("half distinct count")(half.count())
      println(s"[prp] half edges: $nHalf")
      val mirrored = half
        .select(explode(array(
          struct($"x".as("src"), $"y".as("dst")),
          struct($"y".as("src"), $"x".as("dst")))).as("p"))
        .select($"p.src", $"p.dst")
        .withColumn("od", count(lit(1)).over(Window.partitionBy($"src")))
      val ck = t("mirror+window+checkpoint")(mirrored.localCheckpoint(true))
      t("count checkpointed")(ck.count())
      val es = t("collect (src,dst,od)")(
        ck.select($"src", $"dst", $"od").as[(Long, Long, Long)].collect())
      println(s"[prp] mirrored edges: ${es.length}")
      // variant: checkpoint + collect HALF edges only
      val ckh = t("half checkpoint")(half.localCheckpoint(true))
      t("half count")(ckh.count())
      val hs = t("half collect (x,y)")(
        ckh.select($"x", $"y").as[(Long, Long)].collect())
      t("driver deg build")({
        val deg = scala.collection.mutable.LongMap.empty[Long]
        hs.foreach { case (x, y) =>
          deg(x) = deg.getOrElse(x, 0L) + 1L
          deg(y) = deg.getOrElse(y, 0L) + 1L
        }
        deg.size
      })
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
