package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoMean
import graft.tables.Tables

/** Evaluation metrics as aggregations (ref: evaluation package —
  * BinaryClassifierEvaluator, MulticlassClassifierEvaluator,
  * MeanAveragePrecisionEvaluator, SURVEY.md §2.A), plus the custom geomean
  * UDAF (`q_udaf_geomean`).
  *
  * Predictions are derived deterministically from the embeddings table
  * (actual = label; predicted = argmax dimension) so the metric arithmetic —
  * conditional sums, confusion pivot, precision@k windows — is the thing
  * under test, with a DuckDB oracle for each.
  */
object Eval {

  /** Deterministic (actual, predicted) pairs from embeddings. */
  private def preds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label".cast("long").as("actual"),
        ((array_position($"embedding", array_max($"embedding")) - 1) % 10)
          .cast("long").as("predicted"))
  }

  private val predsSql: String =
    """SELECT vec_id, CAST(label AS BIGINT) AS actual,
      |  CAST((list_position(embedding, list_max(embedding)) - 1) % 10 AS BIGINT) AS predicted
      |FROM embeddings""".stripMargin

  /** Binary evaluator: TP/FP/TN/FN -> accuracy/precision/recall/F1
    * (ref: BinaryClassifierEvaluator — pure conditional-sum aggregation). */
  def qEvalBinary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = preds(spark, sfDir)
      .select(($"actual" >= 5).as("act"), ($"predicted" >= 5).as("pred"))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    p.agg(
      cnt($"act" && $"pred").as("tp"),
      cnt(!$"act" && $"pred").as("fp"),
      cnt(!$"act" && !$"pred").as("tn"),
      cnt($"act" && !$"pred").as("fn"))
      .select($"tp", $"fp", $"tn", $"fn",
        round(($"tp" + $"tn").cast("double") / ($"tp" + $"fp" + $"tn" + $"fn"), 4).as("accuracy"),
        round($"tp".cast("double") / ($"tp" + $"fp"), 4).as("precision"),
        round($"tp".cast("double") / ($"tp" + $"fn"), 4).as("recall"),
        round(lit(2.0) * $"tp" / (lit(2.0) * $"tp" + $"fp" + $"fn"), 4).as("f1"))
  }

  val evalBinarySql: String =
    s"""WITH preds AS ($predsSql),
       |p AS (SELECT actual >= 5 AS act, predicted >= 5 AS pred FROM preds),
       |c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN act AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN NOT act AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN NOT act AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |    CAST(sum(CASE WHEN act AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM p)
       |SELECT tp, fp, tn, fn,
       |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn), 4) AS accuracy,
       |  round(CAST(tp AS DOUBLE) / (tp + fp), 4) AS precision,
       |  round(CAST(tp AS DOUBLE) / (tp + fn), 4) AS recall,
       |  round(CAST(2.0 AS DOUBLE) * tp / (CAST(2.0 AS DOUBLE) * tp + fp + fn), 4) AS f1
       |FROM c""".stripMargin

  /** Confusion matrix (ref: MulticlassClassifierEvaluator). */
  def qConfusionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    preds(spark, sfDir)
      .groupBy($"actual", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"actual", $"predicted")
  }

  val confusionMatrixSql: String =
    s"""WITH preds AS ($predsSql)
       |SELECT actual, predicted, count(*) AS n
       |FROM preds GROUP BY actual, predicted ORDER BY actual, predicted""".stripMargin

  /** Mean average precision (ref: MeanAveragePrecisionEvaluator, VOC-style):
    * 10 probes, candidates ranked by cosine, relevant = same label;
    * AP = mean over relevant candidates of precision@rank. */
  def qMeanAvgPrecision(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dblV = transform(col("embedding"), x => x.cast("double"))
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", dblV.as("v"))
      .withColumn("nrm", call_function("graft_norm", $"v"))
    val probes = e.where($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"label".as("p_label"), $"v".as("pv"), $"nrm".as("pn"))
    val wRank = Window.partitionBy($"p_id").orderBy($"cos".desc, $"vec_id")
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.join(broadcast(probes), $"vec_id" =!= $"p_id")
      .withColumn("cos",
        call_function("graft_dot", $"pv", $"v") /
          ($"pn" * $"nrm"))
      .withColumn("rel", when($"label" === $"p_label", 1L).otherwise(0L))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("cum_rel", sum($"rel").over(wCum))
      .groupBy($"p_id")
      .agg(
        sum($"rel").as("n_rel"),
        round(sum(when($"rel" === 1, $"cum_rel".cast("double") / $"rank").otherwise(0.0)) /
          sum($"rel"), 4).as("ap"))
      .orderBy($"p_id")
  }

  val meanAvgPrecisionSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |scored AS (
      |  SELECT p.vec_id AS p_id, c.vec_id,
      |    CASE WHEN c.label = p.label THEN 1 ELSE 0 END AS rel,
      |    list_sum(list_transform(list_zip(p.v, c.v), x -> x[1] * x[2])) / (p.nrm * c.nrm) AS cos
      |  FROM n p JOIN n c ON c.vec_id <> p.vec_id
      |  WHERE p.vec_id < 10),
      |r AS (
      |  SELECT p_id, rel,
      |    row_number() OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id) AS rank,
      |    sum(rel) OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel
      |  FROM scored)
      |SELECT p_id, CAST(sum(rel) AS BIGINT) AS n_rel,
      |  round(sum(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rank ELSE 0.0 END) /
      |        sum(rel), 4) AS ap
      |FROM r GROUP BY p_id ORDER BY p_id""".stripMargin

  /** Exact ROC AUC via the rank-sum identity (ref: BinaryClassifierEvaluator
    * stops at threshold metrics; AUC is the threshold-free companion every
    * model report needs). Labels: `label >= 5`; score: the first embedding
    * dimension — a deterministic score column with real float ties handled
    * exactly. AUC = (R⁺ − P(P+1)/2) / (P·N) where R⁺ is the midrank sum of
    * positives — the Mann–Whitney identity, so tied scores contribute the
    * trapezoid 1/2 exactly rather than approximately.
    *
    * Exactness: scores are grouped (never averaged), so ranks come from
    * integer counts; 2·R⁺ = Σ pos·(2·cum_before + cnt + 1) is an exact
    * integer WIDENED to DECIMAL(38,0)/HUGEINT — the q_mann_whitney rank-sum
    * discipline: 2·R⁺ ~ 2n² passes 2^63 at ~2e9 rows, where Spark's
    * long sum overflows while DuckDB's HUGEINT stays exact,
    * so the engines would diverge — and one double division ends it.
    * Scale shape: one hash aggregate to
    * the distinct-score relation, then the prefix count over it runs as
    * [[Dist.withPrefix]]'s DISTRIBUTED two-pass prefix sum, one 1-row
    * result. The
    * distinct-score grid is ~corpus-cardinality for float scores, so an
    * unpartitioned running-sum window here would be a single-partition
    * funnel at scale — this spelling never materializes one. */
  def qEvalAuc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.embeddings(spark, sfDir)
      .select(($"label" >= 5).as("pos"), element_at($"embedding", 1).as("s"))
    val byScore = scored.groupBy($"s").agg(
      sum(when($"pos", 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("cnt"))
    Dist.withPrefix(byScore, Seq($"s"), Seq("cnt" -> "cumb"))
      .agg(
        sum($"np").as("n_pos"),
        sum($"cnt" - $"np").as("n_neg"),
        sum($"np".cast("decimal(38,0)") * (lit(2L) * $"cumb" + $"cnt" + 1L))
          .as("r2p"))
      .select($"n_pos", $"n_neg",
        round(($"r2p" - $"n_pos".cast("decimal(38,0)") * ($"n_pos" + 1L))
          .cast("double")
          / (lit(2.0) * $"n_pos" * $"n_neg"), 6).as("auc"))
  }

  val evalAucSql: String =
    """WITH s AS (
      |  SELECT label >= 5 AS pos, embedding[1] AS s FROM embeddings),
      |bv AS (
      |  SELECT s, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np, count(*) AS cnt
      |  FROM s GROUP BY 1),
      |c AS (
      |  SELECT np, cnt, coalesce(sum(cnt) OVER (ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM bv),
      |m AS (
      |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
      |    CAST(sum(cnt - np) AS BIGINT) AS n_neg,
      |    sum(CAST(np AS HUGEINT) * (2 * cumb + cnt + 1)) AS r2p
      |  FROM c)
      |SELECT n_pos, n_neg,
      |  round(CAST(r2p - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
      |    / (2.0 * n_pos * n_neg), 6) AS auc
      |FROM m""".stripMargin

  /** Custom geometric-mean UDAF over lineitem prices (SURVEY.md §4: the one
    * custom aggregate; oracle identity exp(avg(ln x))). */
  def qUdafGeomean(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val geomean = udaf(GeoMean)
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(round(geomean($"l_extendedprice"), 4).as("geomean_price"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val udafGeomeanSql: String =
    """SELECT l_returnflag,
      |  round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** NDCG@10 per probe over the same cosine ranking as
    * [[qMeanAvgPrecision]] — the graded-position companion to AP every
    * retrieval report carries: DCG discounts each relevant hit by
    * log2(rank+1), normalized by the ideal ordering's DCG (IDCG over
    * min(n_rel, 10) positions).
    *
    * Exactness: relevance is 0/1 integer; the DCG sum is ≤10 bounded
    * double terms per probe (same determinism budget as AP's
    * precision@rank sum, round 4); IDCG is a closed-form ≤10-term HOF sum
    * from the exact relevant count, identical on both engines. Scale
    * shape: exactly MAP's — broadcast 10 probes, per-probe rank window
    * bounded by the candidate set, one aggregate. */
  def qEvalNdcg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dblV = transform(col("embedding"), x => x.cast("double"))
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", dblV.as("v"))
      .withColumn("nrm", call_function("graft_norm", $"v"))
    val probes = e.where($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"label".as("p_label"), $"v".as("pv"), $"nrm".as("pn"))
    val wRank = Window.partitionBy($"p_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(probes), $"vec_id" =!= $"p_id")
      .withColumn("cos",
        call_function("graft_dot", $"pv", $"v") / ($"pn" * $"nrm"))
      .withColumn("rel", when($"label" === $"p_label", 1L).otherwise(0L))
      .withColumn("rank", row_number().over(wRank))
      .groupBy($"p_id")
      .agg(
        sum($"rel").as("n_rel"),
        sum(when($"rank" <= 10, $"rel".cast("double") / log2($"rank".cast("double") + 1.0))
          .otherwise(0.0)).as("dcg"))
      // ideal DCG from the exact relevant count; greatest(...,1) keeps the
      // sequence non-empty (Spark's sequence(1,0) would DESCEND, not empty)
      .withColumn("idcg",
        aggregate(sequence(lit(1L), greatest(least($"n_rel", lit(10L)), lit(1L))),
          lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0)))
      .select($"p_id", $"n_rel", round($"dcg" / $"idcg", 4).as("ndcg10"))
      .orderBy($"p_id")
  }

  val evalNdcgSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |scored AS (
      |  SELECT p.vec_id AS p_id, c.vec_id,
      |    CASE WHEN c.label = p.label THEN 1 ELSE 0 END AS rel,
      |    list_sum(list_transform(list_zip(p.v, c.v), x -> x[1] * x[2])) / (p.nrm * c.nrm) AS cos
      |  FROM n p JOIN n c ON c.vec_id <> p.vec_id
      |  WHERE p.vec_id < 10),
      |r AS (
      |  SELECT p_id, rel,
      |    row_number() OVER (PARTITION BY p_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored),
      |g AS (
      |  SELECT p_id, CAST(sum(rel) AS BIGINT) AS n_rel,
      |    sum(CASE WHEN rank <= 10 THEN CAST(rel AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1.0)
      |        ELSE 0.0 END) AS dcg
      |  FROM r GROUP BY p_id)
      |SELECT p_id, n_rel,
      |  round(dcg / list_sum(list_transform(
      |    generate_series(1, CAST(greatest(least(n_rel, 10), 1) AS INTEGER)),
      |    i -> 1.0 / log2(CAST(i AS DOUBLE) + 1.0))), 4) AS ndcg10
      |FROM g ORDER BY p_id""".stripMargin

  /** Cohen's kappa between the model's predictions and the gold labels —
    * chance-corrected agreement, the metric annotation pipelines report
    * when raw accuracy is inflated by class imbalance.
    *
    * Exactness: κ = (N·agree − Σ_c rowtot_c·coltot_c) / (N² − Σ_c ...) is
    * assembled entirely from exact integer counts with ONE double division
    * at the end — both engines bit-identical. The marginal-product sum
    * and the N·agree / N² assembly are widened to DECIMAL(38,0)/HUGEINT
    * (they pass 2^63 around N ≈ 3e9 eval docs — Spark's long
    * arithmetic overflows there while DuckDB stays exact, so the
    * engines would diverge), and the rounded κ is `+ 0.0`-normalized on
    * both engines: near-chance agreement sits at κ ≈ 0 BY CONSTRUCTION,
    * and a tiny negative κ rounds to -0.0 on DuckDB vs +0.0 on Spark —
    * a hard fail in the string-compared parity gate. Scale shape: three
    * hash aggregates (one corpus pass + two class-bounded marginals) and a
    * 10-row grid join — corpus size only enters map-side. */
  def qCohensKappa(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = preds(spark, sfDir)
    // class²-bounded confusion grid, MATERIALIZED — totals/marginals are
    // exact integer re-sums of it (ReuseAudit: three runtime corpus
    // scans without it); one corpus pass at any scale
    val cg = p.groupBy($"actual", $"predicted").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // coalesce: an empty corpus must read as 0 docs (the pre-grid count
    // semantics), not as NULL propagating through the kappa arithmetic
    val tot = cg.agg(coalesce(sum($"c"), lit(0L)).as("n"),
      coalesce(sum(when($"actual" === $"predicted", $"c").otherwise(0L)),
        lit(0L)).as("agree"))
    val ma = cg.groupBy($"actual".as("cls")).agg(sum($"c").as("ca"))
    val mp = cg.groupBy($"predicted".as("cls")).agg(sum($"c").as("cp"))
    val pe = ma.join(mp, Seq("cls"), "full_outer")
      .agg(sum(coalesce($"ca", lit(0L)).cast("decimal(38,0)")
        * coalesce($"cp", lit(0L))).as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .select($"n", $"agree".as("n_agree"),
        (round(($"n".cast("decimal(38,0)") * $"agree" - $"pe_num").cast("double")
          / ($"n".cast("decimal(38,0)") * $"n" - $"pe_num").cast("double"), 6)
          + 0.0).as("kappa"))
  }

  val cohensKappaSql: String =
    s"""WITH preds AS ($predsSql),
       |t AS (SELECT count(*) AS n,
       |        sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS agree
       |      FROM preds),
       |ma AS (SELECT actual AS cls, count(*) AS ca FROM preds GROUP BY 1),
       |mp AS (SELECT predicted AS cls, count(*) AS cp FROM preds GROUP BY 1),
       |pe AS (SELECT sum(CAST(coalesce(ca, 0) AS HUGEINT) * coalesce(cp, 0))
       |         AS pe_num
       |       FROM ma FULL OUTER JOIN mp USING (cls))
       |SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
       |  round(CAST(CAST(n AS HUGEINT) * agree - pe_num AS DOUBLE)
       |    / CAST(CAST(n AS HUGEINT) * n - pe_num AS DOUBLE), 6) + 0.0 AS kappa
       |FROM t CROSS JOIN pe""".stripMargin

  /** Calibration (reliability) table + per-bin Brier score: scores are the
    * first embedding dimension min-max mapped to [0,1), micro-quantized to
    * integer millionths, binned into 10 deciles; each bin reports mean
    * predicted probability vs observed positive rate — the "is 0.8 really
    * 80%?" audit — plus its Brier contribution.
    *
    * Exactness: the ONLY doubles before the final projection are the
    * shared (s−mn)·1e6/(mx−mn) mapping (identical op order both engines,
    * then floor → integer); all aggregates are integer, with the
    * squared-error sum widened to DECIMAL(38,0) (each term ≤1e12, so a
    * BIGINT sum would wrap past ~9e6 rows/bin — DuckDB sums in HUGEINT
    * and the engines would diverge instead of both staying exact). Scale
    * shape: one 1-row min/max broadcast + one 10-bin hash aggregate. */
  def qEvalCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.embeddings(spark, sfDir)
      .select(element_at($"embedding", 1).cast("double").as("s"),
        when($"label" >= 5, 1L).otherwise(0L).as("y"))
    val mm = s.agg(min($"s").as("mn"), max($"s").as("mx"))
    s.crossJoin(broadcast(mm))
      .select(
        when($"mx" > $"mn",
          least(floor(($"s" - $"mn") * lit(1000000.0) / ($"mx" - $"mn"))
            .cast("long"), lit(999999L)))
          .otherwise(lit(0L)).as("p_micro"),
        $"y")
      .groupBy(expr("p_micro DIV 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum($"p_micro").as("sum_p"), sum($"y").as("n_pos"),
        sum((($"p_micro" - $"y" * 1000000L) * ($"p_micro" - $"y" * 1000000L))
          .cast("decimal(38,0)")).as("sq"))
      .select($"bin", $"n", $"n_pos",
        round($"sum_p".cast("double") / ($"n" * lit(1000000.0)), 6).as("mean_pred"),
        round($"n_pos".cast("double") / $"n", 6).as("frac_pos"),
        round($"sq".cast("double") / ($"n".cast("double") * lit(1.0e12)), 6).as("brier"))
      .orderBy($"bin")
  }

  val evalCalibrationSql: String =
    """WITH s AS (
      |  SELECT CAST(embedding[1] AS DOUBLE) AS s,
      |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM s),
      |p AS (SELECT CASE WHEN mx > mn
      |        THEN least(CAST(floor((s - mn) * 1000000.0 / (mx - mn)) AS BIGINT),
      |          999999)
      |        ELSE 0 END AS p_micro, y
      |      FROM s CROSS JOIN mm),
      |g AS (SELECT p_micro // 100000 AS bin, count(*) AS n, sum(p_micro) AS sum_p,
      |        sum(y) AS n_pos,
      |        sum(CAST((p_micro - y * 1000000) * (p_micro - y * 1000000)
      |          AS DECIMAL(38,0))) AS sq
      |      FROM p GROUP BY 1)
      |SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
      |  round(CAST(sum_p AS DOUBLE) / (n * 1000000.0), 6) AS mean_pred,
      |  round(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos,
      |  round(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS brier
      |FROM g ORDER BY bin""".stripMargin

  /** Expected calibration error — the ONE number summarizing
    * [[qEvalCalibration]]'s reliability table (Σ_b (n_b/N)·|mean predicted
    * − observed rate|), plus the max-bin gap (MCE). This is the scalar
    * that DECIDES whether to run the [[qIsotonicFit]] → [[qIsotonicApply]]
    * recalibration, completing the diagnose → summarize → fit → serve
    * calibration lifecycle.
    *
    * Exactness: per-bin gaps are exact-integer ratios (sum of micro-probs,
    * positive counts) combined in identical operand order and quantized to
    * micro before the ≤10-term sum/max. Scale shape: identical to the
    * reliability table — one broadcast min/max + one 10-bin aggregate. */
  def qCalibrationEce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    calibrationEceFromScores(Tables.embeddings(spark, sfDir)
      .select(element_at($"embedding", 1).cast("double").as("s"),
        when($"label" >= 5, 1L).otherwise(0L).as("y")))
  }

  /** ECE/MCE core over a (s: double score, y: 0/1 label) frame — factored
    * out so the degenerate constant-score corpus (every gap computed in
    * one bin, no ANSI division hazard) is unit-testable. */
  private[graft] def calibrationEceFromScores(s: DataFrame): DataFrame = {
    val mm = s.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    val g = s.crossJoin(broadcast(mm))
      .select(
        when(col("mx") > col("mn"),
          least(floor((col("s") - col("mn")) * lit(1000000.0)
            / (col("mx") - col("mn"))).cast("long"), lit(999999L)))
          .otherwise(lit(0L)).as("p_micro"),
        col("y"))
      .groupBy(expr("p_micro DIV 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p_micro")).as("sum_p"),
        sum(col("y")).as("n_pos"))
      // ≤10-row grid feeding two consumers — materialize, pinning the
      // corpus-pass count at two (mm + binning); the isotonic discipline
      .localCheckpoint(true)
    val total = g.agg(sum(col("n")).as("ct"))
    val gap = abs(col("sum_p").cast("double") / (col("n") * lit(1000000.0))
      - col("n_pos").cast("double") / col("n"))
    g.crossJoin(broadcast(total))
      .select(
        col("ct"),
        round((col("n").cast("double") / col("ct")) * gap * 1e6).cast("long")
          .as("ece_micro"),
        round(gap * 1e6).cast("long").as("gap_micro"))
      .groupBy(col("ct").as("n"))
      .agg(
        (sum(col("ece_micro")).cast("double") / 1e6).as("ece"),
        (max(col("gap_micro")).cast("double") / 1e6).as("mce"))
  }

  val calibrationEceSql: String =
    """WITH s AS (
      |  SELECT CAST(embedding[1] AS DOUBLE) AS s,
      |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM s),
      |p AS (SELECT CASE WHEN mx > mn
      |        THEN least(CAST(floor((s - mn) * 1000000.0 / (mx - mn)) AS BIGINT),
      |          999999)
      |        ELSE 0 END AS p_micro, y
      |      FROM s CROSS JOIN mm),
      |g AS (SELECT p_micro // 100000 AS bin, count(*) AS n,
      |        CAST(sum(p_micro) AS BIGINT) AS sum_p,
      |        CAST(sum(y) AS BIGINT) AS n_pos
      |      FROM p GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS ct FROM g),
      |terms AS (
      |  SELECT ct,
      |    CAST(round((CAST(n AS DOUBLE) / ct)
      |      * abs(CAST(sum_p AS DOUBLE) / (n * 1000000.0)
      |            - CAST(n_pos AS DOUBLE) / n) * 1e6) AS BIGINT) AS ece_micro,
      |    CAST(round(abs(CAST(sum_p AS DOUBLE) / (n * 1000000.0)
      |      - CAST(n_pos AS DOUBLE) / n) * 1e6) AS BIGINT) AS gap_micro
      |  FROM g, t)
      |SELECT ct AS n,
      |  CAST(CAST(sum(ece_micro) AS BIGINT) AS DOUBLE) / 1e6 AS ece,
      |  CAST(max(gap_micro) AS DOUBLE) / 1e6 AS mce
      |FROM terms GROUP BY ct""".stripMargin

  /** McNemar's paired test — the A/B comparison for two classifiers
    * scored on the SAME examples (here: the full-embedding argmax model
    * vs a cheaper first-8-dims argmax), which a pooled-accuracy z-test
    * gets wrong because the per-example outcomes are correlated. Only
    * the DISCORDANT pairs carry information: b = A right where B wrong,
    * c = the reverse; the continuity-corrected statistic is
    * χ² = (|b−c|−1)²/(b+c), reported with the two-sided p via the same
    * Abramowitz–Stegun erfc polynomial as `q_fdr_bh` (identical operand
    * order on both engines; z floored at 0 so |b−c| ≤ 1 yields the
    * correct p = 1 instead of a negative-x excursion outside the
    * approximation's domain).
    *
    * Exactness: b, c, and both accuracy numerators are exact integer
    * conditional sums off ONE corpus pass; every double appears after
    * aggregation. Scale shape: one hash-free global aggregate — fact
    * rows never shuffle more than their partial sums. */
  def qMcnemar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.embeddings(spark, sfDir).select(
      $"label".cast("long").as("actual"),
      ((array_position($"embedding", array_max($"embedding")) - 1) % 10)
        .cast("long").as("pred_a"),
      ((array_position($"embedding", array_max(slice($"embedding", 1, 8))) - 1) % 10)
        .cast("long").as("pred_b"))
    val c = p.agg(
      count(lit(1)).as("n"),
      sum(when($"pred_a" === $"actual", 1L).otherwise(0L)).as("ka"),
      sum(when($"pred_b" === $"actual", 1L).otherwise(0L)).as("kb"),
      sum(when($"pred_a" === $"actual" && $"pred_b" =!= $"actual", 1L)
        .otherwise(0L)).as("b"),
      sum(when($"pred_a" =!= $"actual" && $"pred_b" === $"actual", 1L)
        .otherwise(0L)).as("c"))
    val z = greatest(
      (abs(($"b" - $"c").cast("double")) - 1.0) /
        sqrt(($"b" + $"c").cast("double")), lit(0.0))
    // two-sided p via the shared A&S 7.1.25 spelling ([[ASErfc]]; its
    // internal abs(z) is the identity here — z is floored at 0 above)
    c.where($"b" + $"c" > 0)
      .select($"n", $"b", $"c",
        round($"ka".cast("double") / $"n", 4).as("acc_a"),
        round($"kb".cast("double") / $"n", 4).as("acc_b"),
        round(z * z, 4).as("chi2"),
        round(ASErfc.pTwoSided(z), 6).as("p_value"))
  }

  val mcnemarSql: String =
    """WITH preds AS (
      |  SELECT CAST(label AS BIGINT) AS actual,
      |    CAST((list_position(embedding, list_max(embedding)) - 1) % 10 AS BIGINT) AS pred_a,
      |    CAST((list_position(embedding, list_max(embedding[1:8])) - 1) % 10 AS BIGINT) AS pred_b
      |  FROM embeddings),
      |c AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN pred_a = actual THEN 1 ELSE 0 END) AS BIGINT) AS ka,
      |    CAST(sum(CASE WHEN pred_b = actual THEN 1 ELSE 0 END) AS BIGINT) AS kb,
      |    CAST(sum(CASE WHEN pred_a = actual AND pred_b <> actual THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN pred_a <> actual AND pred_b = actual THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM preds),
      |zc AS (
      |  SELECT *, greatest((abs(CAST(b - c AS DOUBLE)) - 1.0)
      |    / sqrt(CAST(b + c AS DOUBLE)), 0.0) AS z
      |  FROM c WHERE b + c > 0)
      |SELECT CAST(n AS BIGINT) AS n, b, c,
      |  round(CAST(ka AS DOUBLE) / n, 4) AS acc_a,
      |  round(CAST(kb AS DOUBLE) / n, 4) AS acc_b,
      |  round(z * z, 4) AS chi2,
      |  round(""".stripMargin + ASErfc.sqlPTwoSided("z") + """, 6) AS p_value
      |FROM zc""".stripMargin

  /** Isotonic (monotone) calibration of the argmax classifier's
    * CONFIDENCE — fit the best non-decreasing map from the model's max
    * activation to its empirical correctness rate, the calibration step
    * production scorers run after [[qEvalCalibration]]'s diagnosis says
    * the raw confidences are miscalibrated. Fitted over the 10 decile
    * bins via the exact minimax identity iso(i) = max_{j≤i} min_{k≥i}
    * rate(j..k) — the closed form of pool-adjacent-violators, chosen
    * over PAV's sequential pooling because it is pure bounded-grid
    * relational algebra (no loop, no order-dependent state).
    *
    * Exactness: bin counts and cumulative sums are exact integers
    * (cumulatives via a window-free grid self-join); every interval
    * rate is one int/int double division, and min/max over doubles are
    * order-free. Scale shape: ONE corpus pass to the 10-bin relation +
    * a 1-row min/max broadcast; all three grid joins are 10-row-sided
    * (≤1000 combinations) regardless of corpus size. */
  def qIsotonicFit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.embeddings(spark, sfDir).select(
      array_max($"embedding").cast("double").as("s"),
      when(((array_position($"embedding", array_max($"embedding")) - 1) % 10)
        === $"label", 1L).otherwise(0L).as("y"))
    isotonicFitFromScores(s)
  }

  /** Minimax-identity isotonic fit over a (s: double score, y: 0/1 label)
    * frame — the relational core of [[qIsotonicFit]], factored out so the
    * grid algebra is unit-testable on adversarial fixtures (an interior
    * decile left EMPTY by a skewed score distribution, or an all-equal
    * score corpus that degenerates the min-max grid to one bin). */
  private[graft] def isotonicFitFromScores(s: DataFrame): DataFrame = {
    val mm = s.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    // mx == mn (constant-score corpus) degenerates the grid denominator to
    // 0/0 — Spark 4 ANSI throws on it even for doubles (the
    // q_assortativity precedent), so collapse that corpus into bin 0
    // explicitly on both engines
    val p = s.crossJoin(broadcast(mm)).select(
      when(col("mx") > col("mn"),
        least(floor((col("s") - col("mn")) * lit(1000000.0)
          / (col("mx") - col("mn"))).cast("long"), lit(999999L)))
        .otherwise(lit(0L)).as("p_micro"), col("y"))
    // the ≤10-row bin grid feeds FOUR downstream subtrees (cum's
    // self-join, pairs via cum, innerMin, the final join) — runtime
    // reuse audit (graft.ReuseAudit): AQE's stage cache collapsed the
    // static 12-scan plan only to THREE corpus scans, because the grid
    // subtrees canonicalize differently. Eagerly materializing the tiny
    // grid pins the corpus-pass count at its minimum of two (the mm
    // min/max pass + this binning pass) at ANY corpus size, for the
    // price of checkpointing ten rows
    val g = p.groupBy(expr("p_micro DIV 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .localCheckpoint(true)
    isotonicFromGrid(g)
  }

  /** The bounded-grid half of the minimax isotonic fit: from a
    * materialized ≤10-row (bin, n, n_pos) relation to the calibrated
    * per-bin table — zero corpus scans, every join grid-sided.
    * Factored out so [[qIsotonicApply]] can derive the grid from its
    * OWN binned relation and share one binning pass between fit and
    * serve. */
  private[graft] def isotonicFromGrid(g: DataFrame): DataFrame = {
    // every theta-join below carries an explicit broadcast hint: the
    // sides are ≤10-bin (≤55-pair) relations, but they sit behind
    // aggregations whose stats Catalyst can't bound, so without the hint
    // the non-equi joins would plan CartesianProduct (caught by
    // PlanShapeSpec's whole-surface cartesian guard); broadcast-NLJ over
    // a grid-sized build side is the right physical plan at any corpus
    // scale.
    // The below-cumulatives ride the SAME self-join (b.bin < a.bin arm)
    // rather than a `bin = j-1` predecessor join: a skewed score
    // distribution can leave interior bins EMPTY, and a literal
    // predecessor lookup would miss there and silently treat the
    // cumulative below j as 0, corrupting every interval rate that
    // starts at j
    val cum = g.as("a").join(broadcast(g.as("b")), col("b.bin") <= col("a.bin"))
      .groupBy(col("a.bin").as("bin"))
      .agg(sum(col("b.n")).as("cn"), sum(col("b.n_pos")).as("cp"),
        sum(when(col("b.bin") < col("a.bin"), col("b.n")).otherwise(0L))
          .as("cn_below"),
        sum(when(col("b.bin") < col("a.bin"), col("b.n_pos")).otherwise(0L))
          .as("cp_below"))
    val pairs = cum.as("j").join(broadcast(cum.as("k")), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        ((col("k.cp") - col("j.cp_below")).cast("double") /
          (col("k.cn") - col("j.cn_below")).cast("double")).as("rate"))
    val innerMin = g.select(col("bin").as("i"))
      .join(broadcast(pairs), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("rate")).as("mn_rate"))
    val iso = innerMin.groupBy(col("i").as("bin"))
      .agg(max(col("mn_rate")).as("iso_rate"))
    g.join(iso, "bin")
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("frac_pos"),
        round(col("iso_rate"), 6).as("iso_prob"))
      .orderBy(col("bin"))
  }

  /** Apply the fitted isotonic calibration map back to EVERY row — the
    * serving half of the calibrate lifecycle ([[qIsotonicFit]] is the
    * fit half): each vec's raw max-activation confidence is looked up in
    * its decile bin and replaced by the bin's isotonic (monotone,
    * empirically-calibrated) probability.
    *
    * Scale shape: the 10-row fitted map broadcasts; applying it is one
    * equi-join projection over the corpus — rows never shuffle. */
  def qIsotonicApply(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.embeddings(spark, sfDir).select(
      $"vec_id",
      array_max($"embedding").cast("double").as("s"),
      when(((array_position($"embedding", array_max($"embedding")) - 1) % 10)
        === $"label", 1L).otherwise(0L).as("y"))
    // ONE binned relation feeds both halves of the lifecycle: the fit
    // grid aggregates it and the serving join projects it — 3 corpus
    // passes total (mm, grid agg, serve) instead of fit and serve each
    // re-deriving their own binning. The 1-ROW mm aggregate is
    // materialized too: the round-19 listener audit (graft.RuntimeScans)
    // measured 4 runtime embeddings scans because the serve plan
    // re-derived mm — the r18 comment claimed the pass was shared, but
    // the grid checkpoint only covers the AGGREGATED relation, and both
    // the grid build and the serve plan carried their own mm subtree.
    // Checkpointing one row pins the query at its 3-pass floor
    // (RuntimeScanSpec: embeddings=3).
    val mm = s.agg(min($"s").as("mn"), max($"s").as("mx")).localCheckpoint(true)
    val binned = s.crossJoin(broadcast(mm))
      .select($"vec_id", $"s", $"y",
        when($"mx" > $"mn",
          least(floor(($"s" - $"mn") * lit(1000000.0) / ($"mx" - $"mn"))
            .cast("long"), lit(999999L)))
          .otherwise(lit(0L)).as("p_micro"))
      .select($"vec_id", $"s", $"y", expr("p_micro DIV 100000").as("bin"))
    val g = binned.groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
      .localCheckpoint(true)
    val fit = isotonicFromGrid(g).select($"bin", $"iso_prob".as("cal_prob"))
    binned.join(broadcast(fit), "bin")
      .select($"vec_id", $"bin", round($"s", 6).as("conf"), $"cal_prob")
      .orderBy($"vec_id")
  }

  val isotonicApplySql: String =
    """WITH s AS (
      |  SELECT vec_id, CAST(list_max(embedding) AS DOUBLE) AS s,
      |    CASE WHEN (list_position(embedding, list_max(embedding)) - 1) % 10
      |      = label THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM s),
      |p AS (SELECT vec_id, s,
      |        (CASE WHEN mx > mn
      |         THEN least(CAST(floor((s - mn) * 1000000.0 / (mx - mn)) AS BIGINT),
      |           999999)
      |         ELSE 0 END) // 100000 AS bin, y
      |      FROM s CROSS JOIN mm),
      |g AS (SELECT bin, count(*) AS n, sum(y) AS n_pos FROM p GROUP BY 1),
      |cum AS (
      |  SELECT a.bin, CAST(sum(b.n) AS BIGINT) AS cn,
      |    CAST(sum(b.n_pos) AS BIGINT) AS cp,
      |    CAST(sum(CASE WHEN b.bin < a.bin THEN b.n ELSE 0 END) AS BIGINT) AS cn_below,
      |    CAST(sum(CASE WHEN b.bin < a.bin THEN b.n_pos ELSE 0 END) AS BIGINT) AS cp_below
      |  FROM g a JOIN g b ON b.bin <= a.bin GROUP BY a.bin),
      |pairs AS (
      |  SELECT j.bin AS j, k.bin AS k,
      |    CAST(k.cp - j.cp_below AS DOUBLE)
      |      / CAST(k.cn - j.cn_below AS DOUBLE) AS rate
      |  FROM cum j JOIN cum k ON j.bin <= k.bin),
      |inner_min AS (
      |  SELECT g.bin AS i, pr.j, min(pr.rate) AS mn_rate
      |  FROM g JOIN pairs pr ON pr.j <= g.bin AND pr.k >= g.bin
      |  GROUP BY 1, 2),
      |iso AS (SELECT i AS bin, max(mn_rate) AS iso_rate FROM inner_min GROUP BY 1)
      |SELECT p.vec_id, p.bin, round(p.s, 6) AS conf,
      |  round(i.iso_rate, 6) AS cal_prob
      |FROM p JOIN iso i ON i.bin = p.bin
      |ORDER BY p.vec_id""".stripMargin

  val isotonicFitSql: String =
    """WITH s AS (
      |  SELECT CAST(list_max(embedding) AS DOUBLE) AS s,
      |    CASE WHEN (list_position(embedding, list_max(embedding)) - 1) % 10
      |      = label THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM s),
      |p AS (SELECT CASE WHEN mx > mn
      |        THEN least(CAST(floor((s - mn) * 1000000.0 / (mx - mn)) AS BIGINT),
      |          999999)
      |        ELSE 0 END AS p_micro, y
      |      FROM s CROSS JOIN mm),
      |g AS (SELECT p_micro // 100000 AS bin, count(*) AS n, sum(y) AS n_pos
      |      FROM p GROUP BY 1),
      |cum AS (
      |  SELECT a.bin, CAST(sum(b.n) AS BIGINT) AS cn,
      |    CAST(sum(b.n_pos) AS BIGINT) AS cp,
      |    CAST(sum(CASE WHEN b.bin < a.bin THEN b.n ELSE 0 END) AS BIGINT) AS cn_below,
      |    CAST(sum(CASE WHEN b.bin < a.bin THEN b.n_pos ELSE 0 END) AS BIGINT) AS cp_below
      |  FROM g a JOIN g b ON b.bin <= a.bin GROUP BY a.bin),
      |pairs AS (
      |  SELECT j.bin AS j, k.bin AS k,
      |    CAST(k.cp - j.cp_below AS DOUBLE)
      |      / CAST(k.cn - j.cn_below AS DOUBLE) AS rate
      |  FROM cum j JOIN cum k ON j.bin <= k.bin),
      |inner_min AS (
      |  SELECT g.bin AS i, p.j, min(p.rate) AS mn_rate
      |  FROM g JOIN pairs p ON p.j <= g.bin AND p.k >= g.bin
      |  GROUP BY 1, 2),
      |iso AS (SELECT i AS bin, max(mn_rate) AS iso_rate FROM inner_min GROUP BY 1)
      |SELECT g.bin, CAST(g.n AS BIGINT) AS n, CAST(g.n_pos AS BIGINT) AS n_pos,
      |  round(CAST(g.n_pos AS DOUBLE) / g.n, 6) AS frac_pos,
      |  round(i.iso_rate, 6) AS iso_prob
      |FROM g JOIN iso i ON i.bin = g.bin
      |ORDER BY g.bin""".stripMargin

  /** Deterministic 5-fold cross-validation assignment with a per-language
    * balance audit — the split an eval harness must be able to REPLAY:
    * fold = md5(doc_id) mod 5 (the portable digest-hash convention of
    * `q_hash_sample`), reported as per-(fold, language) counts and each
    * fold's share of its language.
    *
    * Scale shape: a stateless pure projection (any engine, any
    * partitioning reproduces the same folds), one hash aggregate, and a
    * share window over the folds×languages-bounded grid. */
  def qKfoldSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fold = graft.ops.Similarity.digest60($"doc_id".cast("string")) % 5L
    Tables.documents(spark, sfDir)
      .select(fold.as("fold"), $"lang")
      .groupBy($"fold", $"lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("lang_share",
        round($"n_docs".cast("double")
          / sum($"n_docs").over(Window.partitionBy($"lang")), 4))
      .orderBy($"fold", $"lang")
  }

  val kfoldSplitSql: String =
    """WITH f AS (
      |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 5
      |    AS fold, lang
      |  FROM documents),
      |g AS (SELECT fold, lang, count(*) AS n_docs FROM f GROUP BY 1, 2)
      |SELECT fold, lang, n_docs,
      |  round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 4)
      |    AS lang_share
      |FROM g ORDER BY fold, lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_binary" -> (qEvalBinary _),
    "q_confusion_matrix" -> (qConfusionMatrix _),
    "q_mean_avg_precision" -> (qMeanAvgPrecision _),
    "q_eval_auc" -> (qEvalAuc _),
    "q_eval_ndcg" -> (qEvalNdcg _),
    "q_cohens_kappa" -> (qCohensKappa _),
    "q_eval_calibration" -> (qEvalCalibration _),
    "q_calibration_ece" -> (qCalibrationEce _),
    "q_mcnemar" -> (qMcnemar _),
    "q_isotonic_fit" -> (qIsotonicFit _),
    "q_isotonic_apply" -> (qIsotonicApply _),
    "q_kfold_split" -> (qKfoldSplit _),
    "q_udaf_geomean" -> (qUdafGeomean _))

  val oracle: Map[String, String] = Map(
    "q_eval_binary" -> evalBinarySql,
    "q_confusion_matrix" -> confusionMatrixSql,
    "q_mean_avg_precision" -> meanAvgPrecisionSql,
    "q_eval_auc" -> evalAucSql,
    "q_eval_ndcg" -> evalNdcgSql,
    "q_cohens_kappa" -> cohensKappaSql,
    "q_eval_calibration" -> evalCalibrationSql,
    "q_calibration_ece" -> calibrationEceSql,
    "q_mcnemar" -> mcnemarSql,
    "q_isotonic_fit" -> isotonicFitSql,
    "q_isotonic_apply" -> isotonicApplySql,
    "q_kfold_split" -> kfoldSplitSql,
    "q_udaf_geomean" -> udafGeomeanSql)
}
