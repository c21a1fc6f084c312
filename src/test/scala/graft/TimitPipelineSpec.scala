package graft

import org.apache.spark.sql.functions._

import graft.ml.LearningOps.{CosineRandomFeaturesNode, PaddedFFTNode}
import graft.ml.workflow.{ClassLabelIndicators, MaxClassifier, StandardScalerEst}

/** The reference's speech capstone shape (TimitPipeline: frame windows →
  * spectral features → CosineRandomFeatures → block least-squares solve →
  * argmax — the Rahimi–Recht kernel-approximation pipeline the paper runs
  * on ~2.2M TIMIT frames) composed end-to-end from this engine's pieces:
  * PaddedFFT magnitudes, fitted StandardScaler, the seeded
  * random-Fourier featurizer, and the block solver. The capstone asserts
  * the composed pipeline LEARNS: held-out accuracy on a 3-class
  * synthetic phone task must clear a floor far above chance. */
class TimitPipelineSpec extends GraftSuite {

  test("TIMIT shape: frames -> PaddedFFT -> scale -> cosine random features -> solve -> argmax") {
    import spark.implicits._

    // --- synthetic "phone" frames, 3 classes: 60-sample waveforms whose
    // dominant frequency tracks the class (3 / 6 / 9 cycles per frame)
    // under deterministic additive noise, so the spectrum separates
    // classes but the raw waveform does not do so linearly
    val n = 150
    val frames = spark.createDataset((0 until n).map { r =>
      val label = r % 3
      val wave = Array.tabulate(60) { t =>
        math.sin(2 * math.Pi * (3 + 3 * label) * t / 60.0) +
          ((r * 13 + t * 7) % 25 - 12) / 30.0
      }
      (r.toLong, label, wave)
    }).toDF("id", "label", "wave")
    val trainFrames = frames.where($"id" % 5 =!= 0)

    // --- featurize: FFT magnitudes (60 -> pad 64 -> 33 bins), scaler
    // fitted on the TRAIN split only, then 64 random Fourier features
    val pipe = PaddedFFTNode("wave", "spec")
      .andThen(StandardScalerEst("spec", "z"), trainFrames)
      .andThen(CosineRandomFeaturesNode("z", "rf",
        dim = 33, numFeatures = 64, gamma = 0.1))
    val feats = pipe(frames)
    assert(feats.select(size($"rf")).head().getInt(0) == 64)

    // --- one-vs-rest block least squares on +/-1 indicators, held out
    // by id (same solve discipline as the Cifar/ImageFv capstones)
    val withInd = ClassLabelIndicators("label", "ind", 3)
    val train = withInd(feats.where($"id" % 5 =!= 0))
    val test = withInd(feats.where($"id" % 5 === 0))
    // round 14: the solve goes through the COST-MODEL DISPATCHER (the
    // reference's LeastSquaresEstimator picks the solver, the user never
    // does). normalEqMaxDim=32 stands in for "the gram does not fit" at
    // this 64-dim test scale; the model must then route the dense design
    // to block coordinate descent — asserted, not assumed
    val models = (0 until 3).map { k =>
      val est = graft.ml.workflow.LeastSquaresEst("rf", s"y$k", s"score$k",
        regParam = 1e-4, normalEqMaxDim = 32, blockSize = 32, numIter = 2)
      val m = est.fit(train.withColumn(s"y$k", element_at($"ind", k + 1)))
      assert(est.chosenSolver == "block-cd",
        s"dispatcher must block-solve the dense over-cap design: ${est.costReport}")
      m
    }
    val scored = models.foldLeft(test)((d, m) => m(d))
      .withColumn("scores", array($"score0", $"score1", $"score2"))
    val pred = MaxClassifier("scores", "cls")(scored)

    val total = pred.count().toDouble
    val correct = pred.where($"cls" === $"label").count().toDouble
    assert(total > 0)
    val acc = correct / total
    assert(acc >= 0.9,
      s"capstone must learn: held-out accuracy $acc < 0.9 (chance = 0.33)")
  }
}
