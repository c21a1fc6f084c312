package graft

/** A/B probe for q_theil_sen's median-of-pairwise-slopes structure: the
  * checkpointed distributed-prefix arm vs the size-dispatched
  * driver-median arm (collect the calendar-bounded slope multiset — ~3M
  * longs at 7 years of days — sort on the driver, take the middle two).
  * Same session, both warmed, four timed runs each.
  *
  * Measured on the suite fixture (sf0.1, 32 cores, this probe):
  * distributed 3.03/3.06/3.32/4.95 s vs driver 1.25/1.42/1.67/2.54 s —
  * the ~2× win that made the driver arm qTheilSen's default under
  * [[graft.ops.Stats.theilSen]]'s pair ceiling (bench-conditions
  * graft.Probe confirmed 4.16 → 1.70 s on the full-suite shape).
  *
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.TheilProbe`
  */
object TheilProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    spark.read.parquet(s"$sf/orders.parquet").count()
    def run2(label: String)(body: => Any): Unit = {
      val w = body // warm
      val ts = (0 until 4).map { _ =>
        val t = BenchHarness.time(body)
        cleanup() // between-sample hygiene, OUTSIDE the timed region
        t
      }
      println(f"PROBE $label%-12s " +
        ts.map(BenchHarness.fmt(_)).mkString(" ") + s"  $w")
    }
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    run2("distributed") {
      val r = graft.ops.Stats.theilSen(spark, sf, driverMaxPairs = 0L).collect()
      r.mkString
    }
    run2("driver") {
      val r = graft.ops.Stats.theilSen(spark, sf,
        driverMaxPairs = Long.MaxValue).collect()
      r.mkString
    }
    spark.stop()
  }
}
