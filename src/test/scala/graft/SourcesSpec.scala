package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Bucketing, Loaders}

/** Loaders (csv/json-reviews/text-dir) + the bucketed co-located join
  * guarantee. */
class SourcesSpec extends GraftSuite {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("Loaders.csv reads a header CSV with the declared schema") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "data.csv"),
      "id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Loaders.csv(spark, dir, schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.where(col("name") === "beta").head().getDouble(2) == 1.5)
  }

  test("Loaders.jsonReviews maps ratings to binary labels") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(dir, "reviews.json"),
      """{"overall": 5.0, "reviewText": "great product"}
        |{"overall": 1.0, "reviewText": "terrible"}
        |{"overall": 4.0, "reviewText": "pretty good"}
        |""".stripMargin)
    val df = Loaders.jsonReviews(spark, dir)
    assert(df.columns.toSeq == Seq("label", "text"))
    assert(df.where(col("label") === 1).count() == 2)
    assert(df.where(col("label") === 0).count() == 1)
  }

  test("Loaders.textDirPerClass labels docs by directory") {
    val root = tmpDir("news")
    Files.createDirectories(Paths.get(root, "sci_space"))
    Files.createDirectories(Paths.get(root, "rec_autos"))
    Files.writeString(Paths.get(root, "sci_space", "a.txt"), "orbital mechanics\n")
    Files.writeString(Paths.get(root, "rec_autos", "b.txt"), "engine torque\ngearbox\n")
    val df = Loaders.textDirPerClass(spark, root)
    assert(df.count() == 3)
    val labels = df.select("label").distinct().collect().map(_.getString(0)).toSet
    assert(labels == Set("sci_space", "rec_autos"))
    assert(df.where(col("label") === "rec_autos").count() == 2)
  }

  test("bucketed join on the bucket key runs with ZERO shuffles") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    // disable broadcast so the comparison is SortMergeJoin vs SortMergeJoin
    // (with broadcast on, AQE would hide the shuffle question entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(joined.count() == 6000)
      val shuffles = Bucketing.numShuffles(joined)
      assert(shuffles == 0,
        s"co-located bucketed join must not shuffle, found $shuffles exchanges:\n" +
          joined.queryExecution.executedPlan)
      // same join over the raw (unbucketed) parquet DOES shuffle — the
      // baseline the bucketing removes
      val raw = orders.join(lineitem, "o_orderkey")
      raw.count()
      assert(Bucketing.numShuffles(raw) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe.foreach(v =>
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v))
    }
  }
}
