package graft
import org.apache.spark.sql.SparkSession

/** Bench-condition probe — the builder-side instrument for perf claims.
  *
  * Rounds 6/7 showed ISOLATED warm probes underestimate the driver's cold
  * sequential sweep by up to 19× (block-manager pressure from earlier
  * queries + cold codegen paid inside the timed query). This main
  * reproduces bench conditions cheaply: the same session config and
  * warm-up as [[Bench]], then a representative slice of the whole suite
  * (every Nth query in the same sorted order) BEFORE timing the targets,
  * with the same between-query block cleanup. Perf numbers quoted in docs
  * must come from this (or the full Bench), never from a lone query in a
  * fresh session.
  *
  * Usage: `runMain graft.Probe [--explain] q_ann_pq q_cm_heavy_hitters`
  * (no args = time every query; --explain prints each target's formatted
  * physical plan after timing it). Env: SPARK_GRAFT_SF_DIR (default
  * sf0.1), SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PREFIX_STRIDE
  * (prefix sampling stride; default 5, 0 disables the prefix). */
object Probe {
  def main(rawArgs: Array[String]): Unit = {
    val explain = rawArgs.contains("--explain")
    val args = rawArgs.filterNot(_ == "--explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stride = sys.env.getOrElse("SPARK_GRAFT_PREFIX_STRIDE", "5").toInt
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
    // (a synthetic graft_bpe warm was tried here and measured
    // ineffective — negative-result note in Bench.scala's warm block)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val byName = all.toMap
    val targets = if (args.nonEmpty) args.toIndexedSeq else all.map(_._1)
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try byName(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    if (stride > 0) {
      val prefix = all.map(_._1).zipWithIndex
        .collect { case (n, i) if i % stride == 0 && !targets.contains(n) => n }
      println(s"[probe] prefix: ${prefix.size} queries (stride $stride)")
      prefix.foreach(runOne)
    }
    var total = 0.0
    targets.foreach { n =>
      if (byName.contains(n)) {
        val dt = runOne(n)
        total += dt
        println(f"[probe] $n%-28s $dt%8.2f s")
        if (explain) byName(n)(spark, sfDir).explain("formatted")
      } else System.err.println(s"[probe] unknown query: $n")
    }
    println(f"[probe] targets total $total%.2f s over ${targets.size} queries")
    spark.stop()
  }
}
