package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage cost decomposition of the shared shingle-pair core
  * ([[graft.ops.Similarity.shinglePairStats]]) — the single most
  * consumed relation in the suite (~10 dedup/curation queries pay it
  * per run). Times each prefix of the pipeline twice after a warm run
  * so the expensive stage is measured, not guessed.
  *
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.ShingleProbe`
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.count()
    def probe(label: String)(body: => Any): Unit = {
      body // warm codegen/JIT
      val t0 = System.nanoTime(); body
      val t1 = System.nanoTime(); body
      val t2 = System.nanoTime()
      println(f"PROBE $label%-16s " + BenchHarness.fmt((t1 - t0) / 1e9) +
        " " + BenchHarness.fmt((t2 - t1) / 1e9))
    }
    val sh = docs.select($"doc_id",
      explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
    val md = sh.select($"doc_id", md5($"shs").as("m"))
    val dig = md.select($"doc_id",
      conv(substring($"m", 1, 15), 16, 10).cast("long").as("sh1"),
      conv(substring($"m", 17, 15), 16, 10).cast("long").as("sh2"))
    val lists = dig.groupBy($"sh1", $"sh2")
      .agg(sort_array(collect_set($"doc_id")).as("ds"))
      .where(size($"ds") <= graft.ops.Similarity.ShingleMaxDf)
    val counts = lists
      .select(explode(call_function("graft_pairs", $"ds", lit(true))).as("e"))
      .select($"e.x".as("a"), $"e.y".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
    val dig2 = sh.select($"doc_id",
      call_function("graft_md5_split", $"shs").as("dg"))
      .select($"doc_id", $"dg"(0).as("sh1"), $"dg"(1).as("sh2"))
    probe("scan") { docs.select(count($"text")).head() }
    probe("shingles") { sh.select(count($"shs")).head() }
    probe("md5") { md.select(count($"m")).head() }
    probe("digest") { dig.select(avg($"sh1"), avg($"sh2")).head() }
    probe("digest_kernel") { dig2.select(avg($"sh1"), avg($"sh2")).head() }
    probe("digest_match") {
      dig.exceptAll(dig2).union(dig2.exceptAll(dig))
        .select(count(lit(1))).head()
    }
    probe("lists_agg") { lists.select(count(lit(1))).head() }
    probe("pair_counts") { counts.select(count(lit(1))).head() }
    probe("full_core") {
      graft.ops.Similarity.shinglePairStats(spark, sf)
        .select(count(lit(1))).head()
    }
    println("NROWS shingles=" + sh.count() + " lists=" + lists.count() +
      " pairs=" + counts.count())
    spark.stop()
  }
}
