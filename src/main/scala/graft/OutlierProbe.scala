package graft

import org.apache.spark.sql.functions._

/** Stage decomposition + arm A/B for q_outlier_filter: vc build,
  * driver collect, local math, and both full arms.
  *
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.OutlierProbe`
  *
  * Round-18 measurement (sf0.1, 32 cores, warm, 4 samples/stage):
  * vc_build 0.96-1.34 s, collect 0.22-0.30 s, local_math 0.32-0.50 s;
  * full arm_driver 2.82-3.19 s ≈ arm_dist 2.67-3.58 s — warm the arms
  * tie and the ~1.3 s over the stage sum is per-invocation
  * planning/codegen across the arm's four small plans (checkpointed
  * build, count, typed collect, 3-row presentation), the same cold
  * cost Bench pays per query. The relation is price-DOMAIN-bounded
  * (~594k value pairs at sf0.1), so at corpus scale the build
  * amortizes and the bound holds. */
object OutlierProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet").count()
    // clean=false for stages that RE-READ a locally-checkpointed frame:
    // the between-sample unpersist would delete the only copy of its
    // blocks and the next sample dies with CHECKPOINT_RDD_BLOCK_ID_NOT_
    // FOUND (a truncated lineage cannot recompute) — exactly the hazard
    // the r14 self-review flagged for the solver's residual
    def run4(label: String, clean: Boolean = true)(body: => Any): Unit = {
      val w = body
      val ts = (0 until 4).map { _ =>
        val t = BenchHarness.time(body)
        if (clean) cleanup() // between-sample hygiene, OUTSIDE the timed region
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
    run4("collect", clean = false) { vc.as[(String, Double, Long)].collect().length }
    val flat = vc.as[(String, Double, Long)].collect()
    cleanup()
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
