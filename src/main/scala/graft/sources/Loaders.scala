package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source loaders beyond the canonical parquet tables (ref: package
  * `loaders` — CsvDataLoader, AmazonReviewsDataLoader, NewsgroupsDataLoader;
  * SURVEY §2.A loaders table). Each is a thin, declarative wrapper over a
  * Spark file source, so pushdown/pruning reach the scan; none of the
  * reference's driver-side parsing loops survive the translation. */
object Loaders {

  /** ref: CsvDataLoader — header CSV with an explicit schema (schema
    * inference costs an extra full pass at 100 TB; callers supply one). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** ref: CsvDataLoader (exploratory form) — schema inferred, small inputs
    * only. */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** ref: AmazonReviewsDataLoader — JSON-lines reviews to (label, text):
    * rating >= threshold => positive. */
  def jsonReviews(spark: SparkSession, path: String,
      positiveAbove: Double = 3.5): DataFrame =
    spark.read.json(path)
      .select(
        (col("overall") >= positiveAbove).cast("int").as("label"),
        col("reviewText").as("text"))

  /** Columnar ORC source (capability row beyond the reference's CSV/text
    * loaders): same pushdown/pruning contract as parquet — predicates and
    * projections reach the ORC reader (asserted in SourcesSpec). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ref: NewsgroupsDataLoader — directory-per-class text corpus: ONE row
    * per FILE (`wholetext`: a multi-line document stays a single document),
    * label = parent directory name. Still the declarative text file source
    * — each file is one unsplittable task, which is the right granularity
    * for a corpus of many small documents. */
  def textDirPerClass(spark: SparkSession, root: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$root/*/*")
      .withColumn("path", input_file_name())
      .withColumn("label", element_at(split(col("path"), "/"), -2))
      .select(col("value").as("text"), col("label"))

  /** ref: CifarLoader — CIFAR-10-style fixed-length binary records: one
    * label byte followed by x·y bytes per channel, channel-PLANAR (all of
    * channel 0, then channel 1, …). Read via `SparkContext.binaryRecords`
    * (Hadoop's FixedLengthBinaryInputFormat), which splits files AT RECORD
    * BOUNDARIES — a terabyte record dump fans out across executors like
    * any splittable source, nothing funnels through the driver. This is
    * the one loader that is genuinely per-partition imperative (raw byte
    * slicing), so the RDD hop is the right tool; it converts to a
    * DataFrame immediately.
    *
    * Pixels are re-interleaved to the family's row-major (pixel, channel)
    * flat addressing and scaled to [0, 1] doubles, so loaded records feed
    * [[graft.images.ImageOps]] directly. `id` is `monotonically_increasing_id`
    * — unique and partition-parallel, NOT contiguous (contiguity would
    * cost a zipWithIndex count job; nothing downstream needs it). */
  def cifar(spark: SparkSession, path: String, x: Int = 32, y: Int = 32,
      c: Int = 3): DataFrame = {
    import spark.implicits._
    val pixels = x * y
    val records = spark.sparkContext.binaryRecords(path, 1 + pixels * c)
      .map { rec =>
        val img = new Array[Double](pixels * c)
        var ch = 0
        while (ch < c) {
          var p = 0
          while (p < pixels) {
            img(p * c + ch) = (rec(1 + ch * pixels + p) & 0xff) / 255.0
            p += 1
          }
          ch += 1
        }
        (rec(0) & 0xff, img)
      }
    records.toDF("label", "image")
      .select(
        monotonically_increasing_id().as("id"),
        col("label"),
        lit(x).as("x_dim"), lit(y).as("y_dim"), lit(c).as("n_channels"),
        col("image"))
  }
}
