package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Vector / feature-math operator surface over the `embeddings` table.
  *
  * Capability parity with the reference's nodes.stats / nodes.util /
  * nodes.learning scalar-vector nodes (SURVEY.md §2.A): LinearRectifier,
  * SignedHellingerMapper, StandardScaler, LinearMapper,
  * ClassLabelIndicators, MaxClassifier, TopKClassifier,
  * KMeansPlusPlus (fixed-centroid assignment).
  *
  * The reference lifts per-datum Breeze vector functions over RDDs; here
  * each op is a higher-order array expression (transform/aggregate/zip_with)
  * over the `array<float>` column — columnar, codegen'd, zero shuffle for
  * the per-row ops. float→double casts are exact, so both engines compute
  * identical IEEE arithmetic.
  */
object Vectors {

  /** embedding as array<double> (exact widening cast). */
  private def dbl: Column = transform(col("embedding"), x => x.cast("double"))

  // ------------------------------------------------------ per-row mappers

  /** ReLU per element (ref: LinearRectifier). */
  def qVectorRelu(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        transform(dbl, x => round(greatest(x, lit(0.0)), 4)).as("relu"))
      .orderBy($"vec_id")
  }

  val vectorReluSql: String =
    """SELECT vec_id,
      |  list_transform(embedding, x -> round(greatest(CAST(x AS DOUBLE), 0.0), 4)) AS relu
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Signed Hellinger map sign(x)*sqrt(|x|) per element (ref:
    * SignedHellingerMapper). sign is spelled as CASE so both engines agree
    * on the result type. */
  def qVectorHellinger(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hell = transform(dbl, x =>
      round(when(x < 0, -sqrt(-x)).otherwise(sqrt(x)), 4))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", hell.as("hellinger"))
      .orderBy($"vec_id")
  }

  val vectorHellingerSql: String =
    """SELECT vec_id,
      |  list_transform(embedding, x -> round(
      |    CASE WHEN CAST(x AS DOUBLE) < 0 THEN -sqrt(-CAST(x AS DOUBLE))
      |         ELSE sqrt(CAST(x AS DOUBLE)) END, 4) + 0.0) AS hellinger
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ------------------------------------------------- fitted transformers

  /** Per-dimension standardization (ref: StandardScaler + Model). The "fit"
    * is the grouped mean/stddev aggregation per dimension; the "transform"
    * joins the 64-row stats table back (broadcast at any scale). */
  def qStandardScale(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ex = Tables.embeddings(spark, sfDir)
      .select($"vec_id", posexplode(dbl).as(Seq("pos", "v")))
    val stats = ex.groupBy($"pos")
      .agg(avg($"v").as("mu"), stddev_samp($"v").as("sd"))
    ex.join(broadcast(stats), "pos")
      .select($"vec_id", $"pos", round(($"v" - $"mu") / $"sd", 4).as("z"))
      .groupBy($"vec_id")
      .agg(transform(array_sort(collect_list(struct($"pos", $"z"))),
        s => s.getField("z")).as("scaled"))
      .orderBy($"vec_id")
  }

  val standardScaleSql: String =
    """WITH ex AS (
      |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |stats AS (
      |  SELECT pos, avg(v) AS mu, stddev_samp(v) AS sd FROM ex GROUP BY pos)
      |SELECT vec_id, list(round((v - mu) / sd, 4) + 0.0 ORDER BY pos) AS scaled
      |FROM ex JOIN stats USING (pos)
      |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Dense linear map x^T W with a fixed deterministic 64->4 weight matrix
    * W(i,j) = ((i*7 + j*13) mod 10)/10 - 0.45 (ref: LinearMapper; at real
    * scale W is a broadcast model matrix and the product runs per partition
    * via gemm — here the 4-column product is a pure expression). */
  def qLinearMap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = dbl
    val out = transform(sequence(lit(0), lit(3)), j =>
      round(aggregate(sequence(lit(1), lit(64)), lit(0.0), (acc, i) =>
        acc + element_at(d, i) *
          (((i * 7 + j * 13) % 10).cast("double") / 10.0 - 0.45)), 4))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", out.as("projected"))
      .orderBy($"vec_id")
  }

  val linearMapSql: String =
    """SELECT vec_id,
      |  list_transform(range(0, 4), j ->
      |    round(list_sum(list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) *
      |      (CAST((i * 7 + j * 13) % 10 AS DOUBLE) / 10.0 - 0.45))), 4) + 0.0) AS projected
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------- label utilities

  /** Int label -> ±1 one-hot indicator vector (ref:
    * ClassLabelIndicatorsFromIntLabels). */
  def qOnehotLabels(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label",
        transform(sequence(lit(0), lit(9)),
          i => when($"label" === i, 1.0).otherwise(-1.0)).as("indicator"))
      .orderBy($"vec_id")
  }

  val onehotLabelsSql: String =
    """SELECT vec_id, label,
      |  list_transform(range(0, 10),
      |    i -> CASE WHEN label = i THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS indicator
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Argmax over the score vector (ref: MaxClassifier): first index of the
    * maximum, 0-based. */
  def qArgmaxClass(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label",
        (array_position($"embedding", array_max($"embedding")) - 1)
          .cast("long").as("argmax"))
      .orderBy($"vec_id")
  }

  val argmaxClassSql: String =
    """SELECT vec_id, label,
      |  CAST(list_position(embedding, list_max(embedding)) - 1 AS BIGINT) AS argmax
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Top-3 indices by score (ref: TopKClassifier). Spark side sorts an array
    * of (-value, index) structs — per-row, no shuffle; the oracle mirrors
    * with a ranking window. */
  def qTopkClasses(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = transform(dbl, (x, i) =>
      struct((-x).as("neg"), i.cast("long").as("idx")))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        transform(slice(array_sort(scored), 1, 3), s => s.getField("idx")).as("top3"))
      .orderBy($"vec_id")
  }

  val topkClassesSql: String =
    """WITH ex AS (
      |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |r AS (
      |  SELECT vec_id, pos - 1 AS idx,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, pos) AS rn
      |  FROM ex)
      |SELECT vec_id, list(CAST(idx AS BIGINT) ORDER BY rn) AS top3
      |FROM r WHERE rn <= 3 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** K-means assignment against fixed deterministic centroids
    * C(k,i) = (((k*31 + i*17) mod 19)/19 - 0.5) * 0.2 (ref:
    * KMeansPlusPlusEstimator — the oracle-able part is assignment to given
    * centroids; training itself is covered by the MLlib-backed facade).
    * Distances are rounded to 6dp before the argmin so the comparison is
    * engine-stable; ties break on the lower cluster id. */
  def qKmeansAssignFixed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = dbl
    def centroid(k: Column, i: Column): Column =
      (((k * 31 + i * 17) % 19).cast("double") / 19.0 - 0.5) * 0.2
    val dists = transform(sequence(lit(0), lit(9)), k => struct(
      round(aggregate(sequence(lit(1), lit(64)), lit(0.0), (acc, i) =>
        acc + pow(element_at(d, i) - centroid(k, i), 2)), 6).as("dist"),
      k.cast("long").as("k")))
    val best = array_min(dists)
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", best.getField("k").as("cluster"),
        best.getField("dist").as("dist"))
      .orderBy($"vec_id")
  }

  val kmeansAssignFixedSql: String =
    """WITH d AS (
      |  SELECT vec_id, unnest(range(0, 10)) AS k,
      |    round(list_sum(list_transform(range(1, 65), i ->
      |      pow(CAST(embedding[i] AS DOUBLE) -
      |          (CAST((k * 31 + i * 17) % 19 AS DOUBLE) / 19.0 - 0.5) * 0.2, 2))), 6) AS dist
      |  FROM embeddings),
      |r AS (
      |  SELECT vec_id, CAST(k AS BIGINT) AS cluster, dist,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
      |  FROM d)
      |SELECT vec_id, cluster, dist FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vector_relu" -> (qVectorRelu _),
    "q_vector_hellinger" -> (qVectorHellinger _),
    "q_standard_scale" -> (qStandardScale _),
    "q_linear_map" -> (qLinearMap _),
    "q_onehot_labels" -> (qOnehotLabels _),
    "q_argmax_class" -> (qArgmaxClass _),
    "q_topk_classes" -> (qTopkClasses _),
    "q_kmeans_assign_fixed" -> (qKmeansAssignFixed _))

  val oracle: Map[String, String] = Map(
    "q_vector_relu" -> vectorReluSql,
    "q_vector_hellinger" -> vectorHellingerSql,
    "q_standard_scale" -> standardScaleSql,
    "q_linear_map" -> linearMapSql,
    "q_onehot_labels" -> onehotLabelsSql,
    "q_argmax_class" -> argmaxClassSql,
    "q_topk_classes" -> topkClassesSql,
    "q_kmeans_assign_fixed" -> kmeansAssignFixedSql)
}
