package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 scale-escalation instrument (verdict item 7): the sf0.1
  * fixture cannot resolve scale-shape claims, so this main builds a
  * measurement-only 10× corpus under /tmp/sfbig (replicated partitions
  * with offset keys; document text perturbed per replica so the shingle
  * pipeline sees 10× genuine content instead of a quadratic
  * cross-replica near-dup explosion) and A/Bs this round's touched
  * queries old-vs-new INSIDE one JVM, noop-forced (guide §1.4). Nothing
  * here is a declared query or feeds the oracle — it exists to put a
  * number on shape claims the fixture renders noise-level. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = sys.env.getOrElse("SPARK_GRAFT_BIG_DIR", "/tmp/sfbig")
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

    val reps = 10
    def replicate(table: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val out = s"$big/$table.parquet"
      if (!new java.io.File(out).exists()) {
        val base = spark.read.parquet(s"$sf01/$table.parquet")
        (0 until reps).map(i => f(base, i)).reduce(_ union _)
          .write.mode("overwrite").parquet(out)
        println(s"[scale] built $out")
      }
    }
    // keys offset per replica so the graph/doc spaces scale instead of
    // saturating; suppliers/orders land in disjoint replica islands
    replicate("supplier", (d, i) =>
      d.withColumn("s_suppkey", $"s_suppkey" + lit(i * 1000000L)))
    replicate("lineitem", (d, i) =>
      d.withColumn("l_orderkey", $"l_orderkey" + lit(i * 100000000L))
        .withColumn("l_suppkey", $"l_suppkey" + lit(i * 1000000L))
        .withColumn("l_partkey", $"l_partkey" + lit(i * 10000000L)))
    replicate("part", (d, i) =>
      d.withColumn("p_partkey", $"p_partkey" + lit(i * 10000000L)))
    replicate("documents", (d, i) =>
      d.withColumn("doc_id", $"doc_id" + lit(i * 1000000L))
        // suffix every token with the replica tag: all shingles differ
        // across replicas, so near-dup structure replicates instead of
        // exploding quadratically across copies
        .withColumn("text", array_join(
          transform(split($"text", " "), t => concat(t, lit(s"r$i"))), " ")))

    def t(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[scale] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "2").toInt
    for (r <- 1 to rounds) {
      println(s"[scale] --- round $r at 10x (both pagerank arms grade to DISTRIBUTED here)")
      // OLD pagerank path (kept in-tree for tests): dispatch on the
      // mirrored+windowed relation
      t("pagerank OLD (mirrored dispatch)")({
        val nodes = graft.tables.Tables.supplier(spark, big)
          .select($"s_suppkey".as("node"))
        graft.ops.Analytics.pagerank3(nodes,
          graft.ops.Analytics.qPagerankEdgesForTests(spark, big))
          .select($"node".as("suppkey"), $"rank_ppm")
          .orderBy($"rank_ppm".desc, $"suppkey")
      })
      t("pagerank NEW (half-edge dispatch)")(
        graft.ops.Analytics.qPagerank(spark, big))
      // OLD dup_rate spelling: total counted over the raw pair relation
      t("dup_rate OLD (total over pairs)")({
        val src = graft.tables.Tables.documents(spark, big)
          .select($"doc_id", $"source")
        val pairs = graft.ops.Similarity.shingleJaccardPairs(spark, big)
          .join(src.select($"doc_id".as("doc_a"), $"source".as("source_a")), "doc_a")
          .join(src.select($"doc_id".as("doc_b"), $"source".as("source_b")), "doc_b")
          .select(least($"source_a", $"source_b").as("src_lo"),
            greatest($"source_a", $"source_b").as("src_hi"))
        val total = pairs.agg(count(lit(1)).as("n_total"))
        pairs.groupBy($"src_lo", $"src_hi")
          .agg(count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(total))
          .select($"src_lo", $"src_hi", $"n_pairs",
            round($"n_pairs".cast("double") / $"n_total", 4).as("pair_share"))
          .orderBy($"src_lo", $"src_hi")
      })
      t("dup_rate NEW (total over cells)")(
        graft.ops.Similarity.qDupRateBySource(spark, big))
    }
    spark.stop()
  }
}
