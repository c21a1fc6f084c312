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

  /** ref: NewsgroupsDataLoader — directory-per-class text corpus: label =
    * parent directory name of each file. */
  def textDirPerClass(spark: SparkSession, root: String): DataFrame =
    spark.read.textFile(s"$root/*/*").toDF("text")
      .withColumn("path", input_file_name())
      .withColumn("label", element_at(split(col("path"), "/"), -2))
      .drop("path")
}
