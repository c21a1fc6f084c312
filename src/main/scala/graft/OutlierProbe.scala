package graft

import org.apache.spark.sql.functions._

/** Stage decomposition + arm A/B for q_outlier_filter: vc build,
  * driver collect, local math, and both full arms.
  *
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.OutlierProbe`
  */
object OutlierProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet").count()
    def run4(label: String)(body: => Any): Unit = {
      val w = body
      val ts = (0 until 4).map { _ =>
        val t = BenchHarness.time(body)
        cleanup() // between-sample hygiene, OUTSIDE the timed region
        t
      }
      println(f"PROBE $label%-12s " +
        ts.map(BenchHarness.fmt(_)).mkString(" ") +
        s"  ${w.toString.take(60)}")
    }
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def vcOf() = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag".as("flag"),
        round($"l_extendedprice" * 100).as("price_c"))
      .groupBy($"flag", $"price_c").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    run4("vc_build") { val vc = vcOf(); vc.count() }
    val vc = vcOf()
    vc.count()
    run4("collect") { vc.as[(String, Double, Long)].collect().length }
    val flat = vc.as[(String, Double, Long)].collect()
    run4("local_math") {
      flat.groupBy(_._1).toSeq.map { case (flag, xs) =>
        val pv = xs.map(x => (x._2, x._3)).sortBy(_._1)
        (flag, pv.length)
      }.sortBy(_._1).mkString
    }
    cleanup()
    run4("arm_driver") {
      val r = graft.ops.Analytics
        .outlierFilter(spark, sf, driverMaxValues = Long.MaxValue).collect()
      r.mkString
    }
    run4("arm_dist") {
      val r = graft.ops.Analytics
        .outlierFilter(spark, sf, driverMaxValues = 0L).collect()
      r.mkString
    }
    spark.stop()
  }
}
