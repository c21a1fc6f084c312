package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (and optionally print their physical
  * plan) without running the whole Bench sweep.
  *
  * Usage: runMain graft.Probe <sfDir> [--explain] <queryName> [more names...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_ == "--explain")
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
    names.foreach { name =>
      // time construction + count together: several queries do eager work
      // (localCheckpoint, sketch collects) at construction, which Bench
      // pays — excluding it here made probe times lie vs BENCH.json
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"[probe] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (explain) df.explain("formatted")
    }
    spark.stop()
  }
}
