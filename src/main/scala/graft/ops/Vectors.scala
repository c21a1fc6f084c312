package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Vector / feature-math operator surface over the `embeddings` table.
  *
  * Capability parity with the reference's nodes.stats / nodes.util /
  * nodes.learning scalar-vector nodes (SURVEY.md §2.A): LinearRectifier,
  * SignedHellingerMapper, StandardScaler, LinearMapper, CosineRandomFeatures
  * (fixed-W variant), ClassLabelIndicators, MaxClassifier, TopKClassifier,
  * KMeansPlusPlus (fixed-centroid assignment).
  *
  * The reference lifts per-datum Breeze vector functions over RDDs; here
  * each op is a higher-order array expression (transform/aggregate/zip_with)
  * over the `array<float>` column — columnar, codegen'd, zero shuffle for
  * the per-row ops. float→double casts are exact, so both engines compute
  * identical IEEE arithmetic.
  *
  * Output shape: every vector-valued result is emitted as scalar rows
  * `(vec_id, pos, value)` via posexplode rather than as an array column —
  * the same information, but sortable/hashable by any downstream comparator
  * and directly usable as a join/agg input. `pos` is 0-based on both
  * engines.
  */
object Vectors {

  /** embedding as array<double> (exact widening cast). */
  private def dbl: Column = transform(col("embedding"), x => x.cast("double"))

  // ------------------------------------------------------ per-row mappers

  /** ReLU per element (ref: LinearRectifier), one row per (vec_id, pos). */
  def qVectorRelu(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        posexplode(transform(dbl, x => round(greatest(x, lit(0.0)), 4)))
          .as(Seq("pos", "relu")))
      .select($"vec_id", $"pos".cast("long").as("pos"), $"relu")
      .orderBy($"vec_id", $"pos")
  }

  val vectorReluSql: String =
    """SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
      |  round(greatest(CAST(embedding[i] AS DOUBLE), 0.0), 4) + 0.0 AS relu
      |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
      |ORDER BY vec_id, pos""".stripMargin

  /** Signed Hellinger map sign(x)*sqrt(|x|) per element (ref:
    * SignedHellingerMapper). sign is spelled as CASE so both engines agree
    * on the result type. */
  def qVectorHellinger(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hell = transform(dbl, x =>
      round(when(x < 0, -sqrt(-x)).otherwise(sqrt(x)), 4))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", posexplode(hell).as(Seq("pos", "hellinger")))
      .select($"vec_id", $"pos".cast("long").as("pos"), $"hellinger")
      .orderBy($"vec_id", $"pos")
  }

  val vectorHellingerSql: String =
    """SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
      |  round(CASE WHEN CAST(embedding[i] AS DOUBLE) < 0
      |             THEN -sqrt(-CAST(embedding[i] AS DOUBLE))
      |             ELSE sqrt(CAST(embedding[i] AS DOUBLE)) END, 4) + 0.0 AS hellinger
      |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
      |ORDER BY vec_id, pos""".stripMargin

  // ------------------------------------------------- fitted transformers

  /** Per-dimension standardization (ref: StandardScaler + Model). The "fit"
    * is the grouped mean/stddev aggregation per dimension (64 rows); the
    * "transform" joins the stats table back (broadcast at any scale).
    * Output is one row per (vec_id, pos). */
  def qStandardScale(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ex = Tables.embeddings(spark, sfDir)
      .select($"vec_id", posexplode(dbl).as(Seq("pos", "v")))
    val stats = ex.groupBy($"pos")
      .agg(avg($"v").as("mu"), stddev_samp($"v").as("sd"))
    ex.join(broadcast(stats), "pos")
      .select($"vec_id", $"pos".cast("long").as("pos"),
        round(($"v" - $"mu") / $"sd", 4).as("z"))
      .orderBy($"vec_id", $"pos")
  }

  val standardScaleSql: String =
    """WITH ex AS (
      |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |stats AS (
      |  SELECT pos, avg(v) AS mu, stddev_samp(v) AS sd FROM ex GROUP BY pos)
      |SELECT vec_id, CAST(pos AS BIGINT) AS pos, round((v - mu) / sd, 4) + 0.0 AS z
      |FROM ex JOIN stats USING (pos)
      |ORDER BY vec_id, pos""".stripMargin

  /** Dense linear map x^T W with a fixed deterministic 64->4 weight matrix
    * W(i,j) = ((i*7 + j*13) mod 10)/10 - 0.45 (ref: LinearMapper; at real
    * scale W is a broadcast model matrix and the product runs per partition
    * via gemm — here the 4-column product is a pure expression). One row per
    * (vec_id, j). */
  def qLinearMap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = dbl
    // W columns as literal arrays; each output = one codegen'd dot product
    // (graft_dot, same left-to-right sum as the aggregate spelling)
    val out = array((0 to 3).map { j =>
      val w = array((1 to 64).map(i =>
        lit(((i * 7 + j * 13) % 10).toDouble / 10.0 - 0.45)): _*)
      round(call_function("graft_dot", d, w), 4)
    }: _*)
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", posexplode(out).as(Seq("j", "projected")))
      .select($"vec_id", $"j".cast("long").as("j"), $"projected")
      .orderBy($"vec_id", $"j")
  }

  val linearMapSql: String =
    """SELECT vec_id, CAST(j AS BIGINT) AS j,
      |  round(list_sum(list_transform(range(1, 65), i ->
      |    CAST(embedding[i] AS DOUBLE) *
      |    (CAST((i * 7 + j * 13) % 10 AS DOUBLE) / 10.0 - 0.45))), 4) + 0.0 AS projected
      |FROM embeddings, UNNEST(range(0, 4)) AS u(j)
      |ORDER BY vec_id, j""".stripMargin

  /** Random Fourier features cos(w_j·x + b_j) with a fixed deterministic
    * weight matrix (ref: CosineRandomFeatures / RandomSignNode, Rahimi-Recht
    * — the production variant draws W ~ N(0, σ²); here W and b derive from
    * the same integer formula on both engines so the feature values are
    * oracle-checkable). One row per (vec_id, j), 8 features. */
  def qRandomFeaturesFixed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = dbl
    val out = array((0 to 7).map { j =>
      val w = array((1 to 64).map(i =>
        lit(((i * 31 + j * 41) % 23).toDouble / 23.0 - 0.5)): _*)
      round(cos(call_function("graft_dot", d, w) + (j % 7).toDouble), 4)
    }: _*)
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", posexplode(out).as(Seq("j", "feature")))
      .select($"vec_id", $"j".cast("long").as("j"), $"feature")
      .orderBy($"vec_id", $"j")
  }

  val randomFeaturesFixedSql: String =
    """SELECT vec_id, CAST(j AS BIGINT) AS j,
      |  round(cos(list_sum(list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) *
      |      (CAST((i * 31 + j * 41) % 23 AS DOUBLE) / 23.0 - 0.5)))
      |    + CAST(j % 7 AS DOUBLE)), 4) + 0.0 AS feature
      |FROM embeddings, UNNEST(range(0, 8)) AS u(j)
      |ORDER BY vec_id, j""".stripMargin

  // ------------------------------------------------------- label utilities

  /** Int label -> ±1 one-hot indicator (ref:
    * ClassLabelIndicatorsFromIntLabels). One row per (vec_id, class_id). */
  def qOnehotLabels(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label",
        posexplode(transform(sequence(lit(0), lit(9)),
          i => when($"label" === i, 1.0).otherwise(-1.0)))
          .as(Seq("class_id", "indicator")))
      .select($"vec_id", $"label", $"class_id".cast("long").as("class_id"),
        $"indicator")
      .orderBy($"vec_id", $"class_id")
  }

  val onehotLabelsSql: String =
    """SELECT vec_id, label, CAST(c AS BIGINT) AS class_id,
      |  CASE WHEN label = c THEN CAST(1.0 AS DOUBLE)
      |       ELSE CAST(-1.0 AS DOUBLE) END AS indicator
      |FROM embeddings, UNNEST(range(0, 10)) AS u(c)
      |ORDER BY vec_id, class_id""".stripMargin

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
    * of (-value, index) structs — per-row, no shuffle; emitted as one row
    * per (vec_id, rank). The oracle mirrors with a ranking window. */
  def qTopkClasses(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = transform(dbl, (x, i) =>
      struct((-x).as("neg"), i.cast("long").as("idx")))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        posexplode(transform(slice(array_sort(scored), 1, 3),
          s => s.getField("idx"))).as(Seq("r", "idx")))
      .select($"vec_id", ($"r" + 1).cast("long").as("rank"), $"idx")
      .orderBy($"vec_id", $"rank")
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
      |SELECT vec_id, CAST(rn AS BIGINT) AS rank, CAST(idx AS BIGINT) AS idx
      |FROM r WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin

  /** K-means assignment against fixed deterministic centroids
    * C(k,i) = (((k*31 + i*17) mod 19)/19 - 0.5) * 0.2 (ref:
    * KMeansPlusPlusEstimator — the oracle-able part is assignment to given
    * centroids; training itself is covered by the MLlib-backed facade).
    * Distances are rounded to 6dp before the argmin so the comparison is
    * engine-stable; ties break on the lower cluster id. */
  /** Nearest fixed centroid (10 synthetic centroids over 64 dims) as a
    * struct(dist, k) — [[qKmeansAssignFixed]]'s kernel, shared with the
    * SemDeDup-style cluster blocking in `Similarity.qSemdedup`.
    * Centroids are literal arrays; distance = codegen'd graft_sqdist.
    * (x−c)² accumulates in the same i=1..64 order as the aggregate+pow
    * spelling — pow(y,2) and y*y are both correctly rounded, so the sums
    * are bit-identical and the DuckDB oracle (which keeps pow) still
    * hash-matches. */
  private[ops] def fixedCentroidBest(d: Column): Column = {
    val dists = array((0 to 9).map { k =>
      val c = array((1 to 64).map(i =>
        lit((((k * 31 + i * 17) % 19).toDouble / 19.0 - 0.5) * 0.2)): _*)
      struct(
        round(call_function("graft_sqdist", d, c), 6).as("dist"),
        lit(k.toLong).as("k"))
    }: _*)
    array_min(dists)
  }

  def qKmeansAssignFixed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val best = fixedCentroidBest(dbl)
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

  /** Per-dimension embedding statistics — the embedding-QA profile
    * (collapsed dims, scale drift, outlier ranges) run before trusting a
    * vector column at scale. Each element is quantized to integer
    * MICRO-units (`round(v·10⁶)` — float→double widening is exact, one
    * deterministic multiply+round), so count/sum/sum-of-squares/min/max
    * are order-independent long arithmetic; mean/std come from those
    * exact longs by the same final-division spelling on both engines.
    * Scale shape: one posexplode (rows × dims, linear) into a 64-key hash
    * aggregation — map-side combinable, skew-free. */
  def qEmbeddingStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(posexplode($"embedding").as(Seq("dim", "v")))
      .select($"dim".cast("long").as("dim"),
        round($"v".cast("double") * 1e6).cast("long").as("m"))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"), sum($"m").as("s"),
        // operand-widened: m² of micro-quantized elements (~1e14) passes
        // 2^63 near 1e5 rows·dims per key at full magnitude — Spark's
        // long sum overflows where the oracle's HUGEINT stays exact
        sum($"m".cast("decimal(38,0)") * $"m").as("ss"),
        min($"m").as("mn"), max($"m").as("mx"))
      .select($"dim", $"n",
        // + 0.0: centered dims have mean ≈ 0, and a tiny negative mean
        // rounds to -0.0 on DuckDB vs +0.0 on Spark (string-compared)
        (round($"s".cast("double") / $"n" / 1e6, 6) + 0.0).as("mean"),
        round(sqrt(($"ss".cast("double") / $"n" -
          ($"s".cast("double") / $"n") * ($"s".cast("double") / $"n")) / 1e12),
          6).as("std"),
        round($"mn" / 1e6, 6).as("min_v"),
        round($"mx" / 1e6, 6).as("max_v"))
      .orderBy($"dim")
  }

  val embeddingStatsSql: String =
    """WITH e AS (
      |  SELECT CAST(u.i - 1 AS BIGINT) AS dim,
      |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1e6) AS BIGINT) AS m
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
      |a AS (
      |  SELECT dim, count(*) AS n, CAST(sum(m) AS BIGINT) AS s,
      |    sum(CAST(m AS HUGEINT) * m) AS ss,
      |    min(m) AS mn, max(m) AS mx
      |  FROM e GROUP BY 1)
      |SELECT dim, n,
      |  round(CAST(s AS DOUBLE) / n / 1e6, 6) + 0.0 AS mean,
      |  round(sqrt((CAST(ss AS DOUBLE) / n -
      |    (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / 1e12), 6) AS std,
      |  round(mn / 1e6, 6) AS min_v,
      |  round(mx / 1e6, 6) AS max_v
      |FROM a ORDER BY dim""".stripMargin

  /** Embedding norm outliers — the VECTOR-level companion to
    * [[qEmbeddingStats]]' per-dimension profile: vectors whose squared
    * L2 norm sits more than 3σ from the corpus mean are exactly the
    * broken rows an embedding pipeline ships (zeroed vectors from a
    * failed encode, exploded ones from a missing normalization), and at
    * 100 TB they silently poison every cosine downstream unless this
    * audit drops them first.
    *
    * Exactness: each element quantizes to integer micro-units; the
    * squared norm is then an exact ≤2⁴⁸-magnitude integer computed as a
    * codegen'd `graft_dot` of the quantized vector with itself (double
    * arithmetic is EXACT for integers below 2⁵³). The corpus moments
    * widen to DECIMAL(38,0)/HUGEINT (Σnsq wraps a BIGINT past ~3·10⁴
    * vectors of this scale... at 10⁹ rows, and Σnsq² already at the
    * gated SFs); mean/σ and the 3σ gate are identical double operand
    * order on both engines. Scale: one scan + a 1-row broadcast. */
  def qEmbedNormOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val md = transform($"embedding", x => round(x.cast("double") * 1e6))
    val v = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        call_function("graft_dot", md, md).cast("long").as("nsq"))
    val stats = v.agg(count(lit(1)).as("n"),
      sum($"nsq".cast("decimal(38,0)")).as("s"),
      sum($"nsq".cast("decimal(38,0)") * $"nsq").as("ss"))
    v.crossJoin(broadcast(stats))
      .withColumn("mean", $"s".cast("double") / $"n")
      .withColumn("sd", sqrt($"ss".cast("double") / $"n" - $"mean" * $"mean"))
      .where(abs($"nsq" - $"mean") > lit(3.0) * $"sd")
      .select($"vec_id",
        round(sqrt($"nsq".cast("double")) / 1e6, 6).as("norm"),
        (round(($"nsq" - $"mean") / $"sd", 4) + 0.0).as("z"))
      .orderBy($"vec_id")
  }

  val embedNormOutliersSql: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(list_sum(list_transform(embedding,
      |    x -> round(CAST(x AS DOUBLE)*1e6) * round(CAST(x AS DOUBLE)*1e6)))
      |    AS BIGINT) AS nsq
      |  FROM embeddings),
      |st AS (
      |  SELECT count(*) AS n, sum(CAST(nsq AS HUGEINT)) AS s,
      |    sum(CAST(nsq AS HUGEINT) * nsq) AS ss
      |  FROM v),
      |j AS (
      |  SELECT vec_id, nsq, CAST(s AS DOUBLE) / n AS mean,
      |    sqrt(CAST(ss AS DOUBLE) / n -
      |      (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sd
      |  FROM v CROSS JOIN st)
      |SELECT vec_id, round(sqrt(CAST(nsq AS DOUBLE)) / 1e6, 6) AS norm,
      |  round((nsq - mean) / sd, 4) + 0.0 AS z
      |FROM j WHERE abs(nsq - mean) > 3.0 * sd
      |ORDER BY vec_id""".stripMargin

  /** Padded-FFT magnitude spectrum (ref: nodes.stats.PaddedFFT — this
    * query pulls [[graft.ml.LearningOps.PaddedFFTNode]] itself under the
    * oracle gate, upgrading it from unit-only coverage): the first 6
    * embedding dims as a signal, zero-padded to 8, FFT, |bins 0..4|. The
    * oracle recomputes the same bins as the NAIVE padded DFT —
    * √((Σ xₜcos(2πkt/8))² + (Σ xₜsin(2πkt/8))²) — in plain SQL; the
    * node's JTransforms butterfly and the naive sum differ only in
    * summation order (~1e-15 of these O(1) magnitudes), and the closest
    * output to a round-6 boundary measured 2.4e-10 away, so the rounded
    * values are engine-stable by ~5 orders of margin. */
  def qPaddedFft(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sig = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        transform(slice($"embedding", 1, 6), _.cast("double")).as("sig"))
    graft.ml.LearningOps.PaddedFFTNode("sig", "spec")(sig)
      .select($"vec_id", posexplode($"spec").as(Seq("k", "mag")))
      .select($"vec_id", $"k".cast("long").as("k"),
        round($"mag", 6).as("mag"))
      .orderBy($"vec_id", $"k")
  }

  val paddedFftSql: String =
    """SELECT vec_id, CAST(k.k AS BIGINT) AS k,
      |  round(sqrt(
      |    power(list_sum(list_transform(range(1,7), t ->
      |      CAST(embedding[t] AS DOUBLE) * cos(2*pi()*k.k*(t-1)/8.0))), 2) +
      |    power(list_sum(list_transform(range(1,7), t ->
      |      CAST(embedding[t] AS DOUBLE) * sin(2*pi()*k.k*(t-1)/8.0))), 2)), 6)
      |    AS mag
      |FROM embeddings, range(0,5) k(k)
      |ORDER BY vec_id, k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_padded_fft" -> (qPaddedFft _),
    "q_embedding_stats" -> (qEmbeddingStats _),
    "q_embed_norm_outliers" -> (qEmbedNormOutliers _),
    "q_vector_relu" -> (qVectorRelu _),
    "q_vector_hellinger" -> (qVectorHellinger _),
    "q_standard_scale" -> (qStandardScale _),
    "q_linear_map" -> (qLinearMap _),
    "q_random_features_fixed" -> (qRandomFeaturesFixed _),
    "q_onehot_labels" -> (qOnehotLabels _),
    "q_argmax_class" -> (qArgmaxClass _),
    "q_topk_classes" -> (qTopkClasses _),
    "q_kmeans_assign_fixed" -> (qKmeansAssignFixed _))

  val oracle: Map[String, String] = Map(
    "q_padded_fft" -> paddedFftSql,
    "q_embedding_stats" -> embeddingStatsSql,
    "q_embed_norm_outliers" -> embedNormOutliersSql,
    "q_vector_relu" -> vectorReluSql,
    "q_vector_hellinger" -> vectorHellingerSql,
    "q_standard_scale" -> standardScaleSql,
    "q_linear_map" -> linearMapSql,
    "q_random_features_fixed" -> randomFeaturesFixedSql,
    "q_onehot_labels" -> onehotLabelsSql,
    "q_argmax_class" -> argmaxClassSql,
    "q_topk_classes" -> topkClassesSql,
    "q_kmeans_assign_fixed" -> kmeansAssignFixedSql)
}
