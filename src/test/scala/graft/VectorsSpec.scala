package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.ops.Vectors

/** Vector-math operator checks on sf0.001 + scalacheck properties of the
  * shared per-element formulas. */
class VectorsSpec extends GraftSuite {

  test("q_vector_relu output is non-negative and zero exactly where input <= 0") {
    val joined = Vectors.qVectorRelu(spark, sf)
      .join(Vectors.qVectorHellinger(spark, sf), Seq("vec_id", "pos"))
    val negative = joined.where(col("relu") < 0).count()
    assert(negative == 0)
    // hellinger sign encodes the input sign: a negative input can never
    // give positive relu, and a clearly-positive input (hellinger above
    // the 4dp rounding floor sqrt(5e-5) ≈ 0.00707) can never give relu 0.
    val inconsistent = joined.where(
      (col("hellinger") < 0 && col("relu") > 0) ||
        (col("hellinger") > 0.0071 && col("relu") === 0)).count()
    assert(inconsistent == 0)
  }

  test("relu/hellinger emit one row per (vec_id, dimension)") {
    assert(Vectors.qVectorRelu(spark, sf).count() == 500L * 64)
    assert(Vectors.qVectorHellinger(spark, sf).count() == 500L * 64)
  }

  test("q_standard_scale per-dimension moments are ~ (0, 1)") {
    val stats = Vectors.qStandardScale(spark, sf)
      .groupBy("pos").agg(avg("z").as("mu"), stddev_samp("z").as("sd"))
      .collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("mu")) < 1e-3,
        s"dim ${r.get(0)}: mean ${r.getAs[Double]("mu")} not ~0")
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-2,
        s"dim ${r.get(0)}: std ${r.getAs[Double]("sd")} not ~1")
    }
  }

  test("q_argmax_class agrees with rank-1 of q_topk_classes") {
    val am = Vectors.qArgmaxClass(spark, sf).select(col("vec_id"), col("argmax"))
    val top1 = Vectors.qTopkClasses(spark, sf).where(col("rank") === 1)
      .select(col("vec_id"), col("idx"))
    val disagree = am.join(top1, "vec_id")
      .where(col("argmax") =!= col("idx")).count()
    assert(disagree == 0)
  }

  test("q_onehot_labels: exactly one +1 per vector, at the label position") {
    val oh = Vectors.qOnehotLabels(spark, sf)
    val positives = oh.where(col("indicator") === 1.0)
    assert(positives.count() == 500)
    assert(positives.where(col("class_id") =!= col("label")).count() == 0)
    assert(oh.where(col("indicator") === -1.0).count() == 500L * 9)
  }

  test("q_kmeans_assign_fixed emits a valid cluster per vector") {
    val r = Vectors.qKmeansAssignFixed(spark, sf)
    assert(r.count() == 500)
    assert(r.where(col("cluster") < 0 || col("cluster") > 9).count() == 0)
    assert(r.where(col("dist") < 0).count() == 0)
  }

  test("q_random_features_fixed values lie in [-1, 1]") {
    val r = Vectors.qRandomFeaturesFixed(spark, sf)
    assert(r.count() == 500L * 8)
    assert(r.where(col("feature") < -1.0 || col("feature") > 1.0).count() == 0)
  }

  test("property: relu formula is idempotent and monotone") {
    checkProp(Prop.forAll(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0)) {
      (x: Double, y: Double) =>
        val relu = (v: Double) => math.max(v, 0.0)
        relu(relu(x)) == relu(x) && (x > y || relu(x) <= relu(y))
    }, "relu idempotent+monotone")
  }

  test("property: signed hellinger preserves sign and order") {
    checkProp(Prop.forAll(Gen.chooseNum(-100.0, 100.0)) { x: Double =>
      val h = math.signum(x) * math.sqrt(math.abs(x))
      math.signum(h) == math.signum(x) && math.abs(h * h - math.abs(x)) < 1e-9
    }, "hellinger sign/inverse")
  }

  test("q_embedding_stats profiles every dimension with coherent moments") {
    val r = rows(graft.ops.Vectors.qEmbeddingStats(spark, sf))
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(r.size == 64, "one row per embedding dimension")
    r.foreach { row =>
      assert(row.getAs[Long]("n") == nVec)
      val (mn, mean, mx) = (row.getAs[Double]("min_v"),
        row.getAs[Double]("mean"), row.getAs[Double]("max_v"))
      assert(mn <= mean && mean <= mx)
      assert(row.getAs[Double]("std") >= 0.0)
      assert(row.getAs[Double]("std") <= (mx - mn), "std bounded by range")
    }
  }

  test("q_embed_norm_outliers matches a driver-side 3-sigma replay") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6).toDouble))
    val nsq = vecs.map { case (id, m) => id -> m.map(x => x * x).sum.toLong }
    val n = nsq.length
    val mean = nsq.map(_._2.toDouble).sum / n
    val sd = math.sqrt(nsq.map(x => x._2.toDouble * x._2).sum / n - mean * mean)
    val expectIds = nsq.filter { case (_, q) =>
      math.abs(q - mean) > 3.0 * sd }.map(_._1).toSet
    val got = rows(graft.ops.Vectors.qEmbedNormOutliers(spark, sf))
    assert(got.map(_.getAs[Long]("vec_id")).toSet == expectIds)
    assert(got.nonEmpty, "the fixture corpus must contain norm outliers")
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) >= 3.0 - 1e-3,
        s"reported z must be beyond the gate: $r")
    }
  }
}
