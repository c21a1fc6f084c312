package graft

// Scratch A/B probe for q_dedup_shingle_jaccard variants (dev-only; not part
// of the declared surface — delete before round end if noisy).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProbeDedup {
  val ShingleMaxDf = 20

  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    def shinglesOf(toksDf: DataFrame, distinctPerDoc: Boolean): DataFrame = {
      val sh0 = transform(sequence(lit(1), size($"t") - 2), i =>
        concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
          element_at($"t", i + 2)))
      val sh = if (distinctPerDoc) array_distinct(sh0) else sh0
      val shingles = when(size($"t") >= 3, sh)
        .otherwise(array().cast("array<string>"))
      toksDf.select($"doc_id", explode(shingles).as("shs"))
    }

    def toks(d: DataFrame): DataFrame =
      d.select($"doc_id", filter(split($"text", " "), x => x =!= "").as("t"))

    def digest(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

    def fullFrom(lists0: DataFrame): DataFrame = {
      val lists = lists0.persist()
      val sizes = lists.select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val postings = lists.select($"sh", posexplode($"ds").as(Seq("i", "d")))
      val pairs = postings.as("a").join(postings.as("b"), Seq("sh"))
        .where($"a.i" < $"b.i")
        .select($"a.d".as("doc_a"), $"b.d".as("doc_b"))
      pairs.groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_inter"))
        .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
        .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
        .withColumn("jaccard",
          $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
        .where($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
    }

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe-dedup] $tag rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    variant match {
      case "explode" =>
        time("explode-only")(shinglesOf(toks(docs), distinctPerDoc = true).count())
      case "explode32" =>
        time("explode-only-repart32")(
          shinglesOf(toks(docs.repartition(32)), distinctPerDoc = true).count())
      case "explode32nodist" =>
        time("explode-repart32-nodistinct")(
          shinglesOf(toks(docs.repartition(32)), distinctPerDoc = false).count())
      case "digest32" =>
        time("digest-repart32")(
          shinglesOf(toks(docs.repartition(32)), distinctPerDoc = true)
            .select($"doc_id", digest($"shs").as("sh")).count())
      case "lists" =>
        time("lists-build-current")(
          shinglesOf(toks(docs), distinctPerDoc = true)
            .select($"doc_id", digest($"shs").as("sh"))
            .groupBy($"sh").agg(sort_array(collect_list($"doc_id")).as("ds"))
            .where(size($"ds") <= ShingleMaxDf).count())
      case "lists32" =>
        time("lists-build-repart32")(
          shinglesOf(toks(docs.repartition(32)), distinctPerDoc = true)
            .select($"doc_id", digest($"shs").as("sh"))
            .groupBy($"sh").agg(sort_array(collect_list($"doc_id")).as("ds"))
            .where(size($"ds") <= ShingleMaxDf).count())
      case "full32" =>
        val lists0 = shinglesOf(toks(docs.repartition(32)), distinctPerDoc = false)
          .select($"doc_id", digest($"shs").as("sh"))
          .groupBy($"sh").agg(sort_array(collect_set($"doc_id")).as("ds"))
          .where(size($"ds") <= ShingleMaxDf)
        time("full-repart32-collectset")(fullFrom(lists0).count())
      case "union1pass" =>
        val lists = shinglesOf(toks(docs), distinctPerDoc = false)
          .select($"doc_id", digest($"shs").as("sh"))
          .groupBy($"sh").agg(sort_array(collect_set($"doc_id")).as("ds"))
          .where(size($"ds") <= ShingleMaxDf)
        val pairStructs = flatten(transform($"ds", (a, i) =>
          transform(slice($"ds", i + 2, size($"ds")),
            b => struct(a.alias("x"), b.alias("y")))))
        val singles = transform($"ds", d =>
          struct(d.alias("x"), lit(-1L).alias("y")))
        val ev = lists.select(explode(concat(pairStructs, singles)).as("e"))
          .select($"e.x".as("a"), $"e.y".as("b"))
        val counts0 = ev.groupBy($"a", $"b").agg(count(lit(1)).as("c"))
        val counts = counts0.persist()
        val sizes = counts.where($"b" === -1L)
          .select($"a".as("doc"), $"c".as("n_sh"))
        val res = counts.where($"b" =!= -1L)
          .select($"a".as("doc_a"), $"b".as("doc_b"), $"c".as("n_inter"))
          .join(broadcast(sizes.select($"doc".as("doc_a"), $"n_sh".as("n_a"))), "doc_a")
          .join(broadcast(sizes.select($"doc".as("doc_b"), $"n_sh".as("n_b"))), "doc_b")
          .withColumn("jaccard",
            $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
          .where($"jaccard" >= 0.8)
          .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
        time("union-1pass")(res.count())
        counts.unpersist()
      case "native" =>
        val lists = docs.select($"doc_id",
            explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
          .select($"doc_id", digest($"shs").as("sh"))
          .groupBy($"sh").agg(sort_array(collect_set($"doc_id")).as("ds"))
          .where(size($"ds") <= ShingleMaxDf)
        val inter = lists
          .select(explode(call_function("graft_pairs", $"ds", lit(false))).as("e"))
          .groupBy($"e.x".as("doc_a"), $"e.y".as("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        val sizes = lists.select(explode($"ds").as("doc_id"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
        val res = inter
          .join(broadcast(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a"))), "doc_a")
          .join(broadcast(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b"))), "doc_b")
          .withColumn("jaccard",
            $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
          .where($"jaccard" >= 0.8)
          .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
        time("native-reuse")(res.count())
        val plan = res.queryExecution.executedPlan.toString
        val reused = plan.contains("ReusedExchange") ||
          plan.contains("ReusedQueryStage") || plan.contains("reuses operator id")
        println(s"[probe-dedup] native plan reuse=$reused")
        if (args.contains("--explain")) println(plan)
      case "nativelists" =>
        time("native-lists-build")(
          docs.select($"doc_id",
              explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
            .select($"doc_id", digest($"shs").as("sh"))
            .groupBy($"sh").agg(sort_array(collect_set($"doc_id")).as("ds"))
            .where(size($"ds") <= ShingleMaxDf).count())
      case "nativeexplode" =>
        time("native-explode-only")(
          docs.select($"doc_id",
            explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
            .select($"doc_id", digest($"shs").as("sh")).count())
      case "native1pass" =>
        val lists = docs.select($"doc_id",
            explode(call_function("graft_shingles", $"text", lit(3))).as("shs"))
          .select($"doc_id", digest($"shs").as("sh"))
          .groupBy($"sh").agg(sort_array(collect_set($"doc_id")).as("ds"))
          .where(size($"ds") <= ShingleMaxDf)
        val ev = lists
          .select(explode(call_function("graft_pairs", $"ds", lit(true))).as("e"))
          .select($"e.x".as("a"), $"e.y".as("b"))
        val counts = ev.groupBy($"a", $"b").agg(count(lit(1)).as("c"))
        val sizes = counts.where($"b" === -1L)
          .select($"a".as("doc"), $"c".as("n_sh"))
        val res = counts.where($"b" =!= -1L)
          .select($"a".as("doc_a"), $"b".as("doc_b"), $"c".as("n_inter"))
          .join(sizes.select($"doc".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
          .join(sizes.select($"doc".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
          .withColumn("jaccard",
            $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
          .where($"jaccard" >= 0.8)
          .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
        time("native-1pass")(res.collect().length.toLong)
        // explain AFTER collect() on the SAME QueryExecution: the adaptive
        // plan is final here, so ReusedQueryStage/ReusedExchange are visible
        val planStr = res.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"[probe-dedup] reuse=" +
          (planStr.contains("ReusedExchange") || planStr.contains("ReusedQueryStage")))
        if (args.contains("--explain")) println(planStr)
      case "baseline" =>
        time("full-current")(
          SparkEntry.queries("q_dedup_shingle_jaccard")(spark, sfDir).count())
    }
    spark.stop()
  }
}
