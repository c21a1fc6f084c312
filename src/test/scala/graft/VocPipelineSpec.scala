package graft

import org.apache.spark.sql.functions._

import graft.images.ImageOps
import graft.ml.ImageFvPipeline
import graft.ml.LearningOps.BlockLeastSquaresMultiEst

/** The reference's VOC capstone shape (VOCSIFTFisher: multi-LABEL images
  * → dense descriptors → PCA → GMM → FisherVector → one binary solve per
  * class → VOC-style mean average precision) composed from this engine's
  * pieces, with the MeanAveragePrecisionEvaluator role replayed exactly
  * in the test: per class, held-out images ranked by score and
  * AP = Σ_hits precision@hit / n_pos, averaged over classes. The floor
  * (0.85) sits far above the ~0.5 random-ranking AP at this class
  * balance. */
class VocPipelineSpec extends GraftSuite {

  test("VOCSIFTFisher shape: multi-label FV -> per-class solve -> VOC mAP floor") {
    import spark.implicits._

    // --- synthetic multi-label 8x8x3 images: class c present in image r
    // iff bit c of (r % 8) is set (all 8 label subsets cycle uniformly ->
    // per-class base rate 0.5). A present class lights up its color
    // channel; +/-12 deterministic noise keeps the task non-trivial.
    val n = 160
    def present(r: Int, c: Int): Boolean = (((r % 8) >> c) & 1) == 1
    val imgs = spark.createDataset((0 until n).map { r =>
      val px = Array.tabulate(8 * 8 * 3) { q =>
        val c = q % 3
        20.0 + (if (present(r, c)) (c + 1) * 18 else 0) +
          (r * 13 + q * 7) % 25 - 12
      }
      ImageOps.Img(r.toLong, 8, 8, 3, px)
    })
    val labels = spark.createDataFrame((0 until n).map { r =>
      (r.toLong,
        if (present(r, 0)) 1.0 else -1.0,
        if (present(r, 1)) 1.0 else -1.0,
        if (present(r, 2)) 1.0 else -1.0)
    }).toDF("id", "y0", "y1", "y2")

    // --- LCS descriptors -> fitted FV encoder (train split only)
    val lcsOut = ImageOps.lcs(imgs, cell = 2).toDF()
    val descs = ImageFvPipeline.cellDescriptors(lcsOut, descDim = 6)
    val trainIds = labels.where($"id" % 5 =!= 0).select($"id")
    val enc = ImageFvPipeline.fit(
      descs.join(trainIds, "id"), "id", "desc", "fv", pcaK = 4, gmmK = 5)
    val fvs = enc(descs).join(labels, "id")

    // --- all three binary targets solved SIMULTANEOUSLY off one shared
    // gram per block (round 14 — the reference estimator's actual
    // multi-label shape; the VOC discipline still holds: classes are NOT
    // mutually exclusive, so no argmax anywhere, just k score columns)
    val train = fvs.where($"id" % 5 =!= 0)
      .withColumn("ys", array($"y0", $"y1", $"y2"))
    val test = fvs.where($"id" % 5 === 0)
    val model = BlockLeastSquaresMultiEst("fv", "ys", "scores",
      blockSize = 40, numIter = 2, lambda = 1e-4).fit(train)
    val scored = model(test)
      .select($"id", $"y0", $"y1", $"y2",
        element_at($"scores", 1).as("score0"),
        element_at($"scores", 2).as("score1"),
        element_at($"scores", 3).as("score2"))
      .collect()

    // --- VOC mAP (MeanAveragePrecisionEvaluator role, exact replay):
    // rank by score desc (id tiebreak), AP = mean precision at each hit
    val aps = (0 until 3).map { k =>
      val ranked = scored.map { r =>
        (r.getAs[Double](s"score$k"), r.getAs[Long]("id"),
          r.getAs[Double](s"y$k") > 0)
      }.sortBy { case (s, id, _) => (-s, id) }
      val nPos = ranked.count(_._3)
      assert(nPos > 0 && nPos < ranked.length, "class must be non-degenerate")
      var hits = 0
      var sumPrec = 0.0
      ranked.zipWithIndex.foreach { case ((_, _, rel), i) =>
        if (rel) { hits += 1; sumPrec += hits.toDouble / (i + 1) }
      }
      sumPrec / nPos
    }
    val mAP = aps.sum / aps.length
    assert(mAP >= 0.85,
      s"capstone must learn: held-out mAP $mAP < 0.85 (random ~ 0.5); " +
        s"per-class APs = $aps")
  }
}
