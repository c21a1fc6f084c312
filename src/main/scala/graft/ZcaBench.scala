package graft

import org.apache.spark.sql.functions._

/** Focused ZCA-apply micro-benchmark — times the two width-dispatched
  * transform spellings (the d-graft_centered_dot expression Project vs
  * the per-partition dgemm) on the same fitted model, so the
  * `maxServeWidth` cap carries measured evidence instead of a guess,
  * and prints each plan's formatted shape on request.
  *
  * `runMain graft.ZcaBench [n] [d] [--explain]` (defaults 400000 32)
  * prints one JSON line with seconds per spelling. Uses
  * [[BenchHarness.seededVectors]] — no data files needed.
  *
  * Round-17 measurements that SET the cap (SPARK_GRAFT_CPUS=8, n=400k,
  * two runs each, containsNull=false inputs so the Project
  * whole-stage-codegen-fuses — `* Project` in the explain):
  *  - d=32: expr 1.03/1.09 s vs gemm 0.36/0.40 s (~2.7×) — the cap's
  *    sanctioned gap, paid in exchange for zero-job serving.
  *  - d=64: expr 94.7/97.7 s vs gemm 0.62/0.65 s — the fused Project
  *    method passes HotSpot's huge-method JIT limit and the generated
  *    code runs INTERPRETED. The cliff, not a gradient: d=40/48/56
  *    scale smoothly (1.12/1.76/2.22 s) and the collapse happens
  *    between 56 and 64 on this JVM, so the cap at 32 carries a full
  *    2× width margin.
  *  - History for the record: the original zip_with-centered spelling
  *    (CodegenFallback centering re-run per output dim, Project never
  *    fused) measured 4.6 s at d=32 — 11× over gemm — which is why
  *    [[graft.functions.CenteredDot]] exists; with an interpreted
  *    guard present (containsNull=true inputs) the kernel spelling
  *    does NOT fuse and lands at 0.8-2.4 s for d=32-64 — slower than
  *    fused-d=32 but immune to the JIT cliff (each expression compiles
  *    into its own split method).
  *
  * The un-JIT-able-fused-method hazard is WIDTH-dependent, not
  * data-dependent, so the width cap removes it deterministically.
  *
  * Round-18 re-measurement on the DERIVED cap
  * ([[graft.ml.LearningOps.defaultZcaServeWidth]], = 32 on this product
  * JVM where HugeMethodLimit is unreadable; default CPUs, n=400k):
  * d=32 expr 0.51/0.46 s vs gemm 0.30/0.29 s (~1.7×); d=64 cliff
  * re-confirmed at 80.4 s expr vs 0.48 s gemm (~168×). */
object ZcaBench {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val nums = args.filterNot(_.startsWith("--"))
    val n = nums.lift(0).map(_.toInt).getOrElse(400000)
    val d = nums.lift(1).map(_.toInt).getOrElse(32)
    val spark = BenchHarness.session()
    val base = BenchHarness.seededVectors(spark, n, d)
    val (mu, w, dd) = graft.ml.LearningOps.fitZcaModel(base, "v", 1e-5)
    val exprT = graft.ml.LearningOps.zcaExprTransformer("v", "y", mu, w, dd)
    val gemmT = graft.ml.LearningOps.zcaGemmTransformer("v", "y", mu, w, dd)
    // force every output value through an aggregate so neither spelling
    // can prune the transform away (count() would)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(sum(aggregate(col("y"), lit(0.0), (a, x) => a + x))).head()
    force(exprT(base)) // warm codegen/JIT for both spellings once
    force(gemmT(base))
    val tExpr = BenchHarness.time(force(exprT(base)))
    val tGemm = BenchHarness.time(force(gemmT(base)))
    if (explain) {
      exprT(base).explain("formatted")
      gemmT(base).explain("formatted")
    }
    println(s"""{"bench":"zca_apply","n":$n,"d":$d,"expr_sec":$tExpr,"gemm_sec":$tGemm}""")
    spark.stop()
  }
}
