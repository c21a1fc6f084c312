package graft

/** Scale-slope canaries for the heavy query family: run each at sf0.01 AND
  * sf0.1 and assert the 10× data ratio costs < 15× wall time. An
  * accidentally quadratic shape (unblocked self-join, uncapped posting
  * list, per-row rescan) costs ~100× at 10× data — this cheap slope check
  * catches it even though the absolute sf0.1 time alone would still look
  * "fast" on a big machine.
  *
  * Methodology: one un-timed warm-up run at sf0.01 first (whole-stage
  * codegen compilation and session JIT are per-plan one-time costs shared
  * by both scales); the sf0.01 time is floored at 0.3 s so scheduling
  * noise on a near-instant small run can't manufacture a phantom slope.
  * `q_image_convolve`/`q_image_*` are excluded: their input is
  * fixed-count synthetic images, so they have no data slope by
  * construction — `q_image_fisher_vector` (embeddings-table-driven)
  * covers the descriptor-aggregation family instead. */
class ScalingSpec extends GraftSuite {

  private val sfSmall = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"
  private val MaxSlope = 15.0
  private val FloorSec = 0.3

  private def time(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  // q_pagerank and q_triangle_count are deliberately absent: the supplier
  // co-purchase graph is near-complete on this synthetic data, so the
  // EDGE count grows ~|V|² with SF by data shape (100 → 1000 suppliers ⇒
  // ~100× edges at 10× rows; the sf0.01 graph is complete and has MORE
  // triangles than sf0.1's thresholded one) — a slope gate would measure
  // the generator, not the plan.
  Seq("q_dedup_shingle_jaccard", "q_dedup_minhash", "q_ann_ivf",
      "q_embed_neardup", "q_image_fisher_vector", "q_shingle_cosine",
      "q_bm25", "q_token_entropy", "q_rolling_anomaly",
      "q_bloom_semijoin", "q_cm_heavy_hitters", "q_lsh_quality",
      "q_part_affinity", "q_join_interval_binned").foreach { name =>
    test(s"$name: 10x data costs < ${MaxSlope.toInt}x wall time") {
      time(name, sfSmall) // warm-up: codegen + JIT out of both timings
      val tSmall = math.max(time(name, sfSmall), FloorSec)
      // min-of-2 on the big run: one GC pause or noisy neighbor must not
      // fail the quadratic-shape canary
      val tBig = math.min(time(name, sfBig), time(name, sfBig))
      val slope = tBig / tSmall
      info(f"$name: sf0.01=$tSmall%.2fs sf0.1=$tBig%.2fs slope=$slope%.1fx")
      assert(slope < MaxSlope,
        f"$name slope $slope%.1fx >= $MaxSlope%.0fx — a 10x data step " +
          "should never cost this much; check for an unblocked join or " +
          "uncapped candidate set")
    }
  }
}
