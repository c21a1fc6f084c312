package graft.ml

/** The reference's solver-selection cost model (ref:
  * nodes/learning/LeastSquaresEstimator — KeystoneML's headline
  * operator-level optimization, credited with up to ~7× in the ICDE'17
  * paper: the estimator inspects the PROBLEM — n, d, k, sparsity,
  * cluster resources — and picks the physical solver, instead of making
  * the user choose). Re-expressed for the three solvers this library
  * ships:
  *
  *  - `normal`    — one distributed gram pass (X'X, X'y) + an exact
  *    driver-side solve. Cost n·d·(d+k) flops over the cluster plus d³
  *    on the driver; ONE data pass; d² driver memory. Sparsity does not
  *    help: the gram densifies.
  *  - `l-bfgs`    — MLlib's iterative quasi-Newton. Per iteration one
  *    gradient pass: ~2·nnz·k flops and nnz·8 bytes touched, where
  *    nnz = n·d·density (the dispatcher feeds MLlib SPARSE vectors when
  *    density warrants, so the density term is real, not aspirational).
  *    Never materializes d² state — the only solver for wide AND sparse.
  *  - `block-cd`  — block coordinate descent over column blocks of
  *    width b with a MATERIALIZED residual: per epoch each block costs
  *    one n·b² gram pass + an n·b residual update touching only the
  *    block's columns (column-major partition layout), so an epoch is
  *    ~n·d·b flops and ~n·d·8 bytes regardless of how many blocks d
  *    splits into. Exact per-block solves, b² driver memory — the wide
  *    DENSE workhorse (the reference's TIMIT/ImageNet solver).
  *
  * The model sums four physical terms per solver — cluster flops,
  * memory-bandwidth bytes, aggregation-tree network bytes, and a fixed
  * per-barrier latency (each distributed pass is a scheduled job) — and
  * picks the cheapest, EXCEPT that a more exact solver within
  * [[ExactnessWindow]] of the cheapest wins the tie: the reference
  * prefers exact solutions when they cost about the same (exactness
  * order: normal > block-cd > l-bfgs). All constants are deliberately
  * coarse hardware shapes; dispatch only needs the RATIOS right.
  */
object SolverCostModel {

  /** Fit-time problem statistics, probed from the training frame. */
  final case class Problem(
      n: Long, // training rows
      d: Int, // feature width
      k: Int, // simultaneous solve targets (1 for a scalar label)
      density: Double, // nnz fraction of the design, in (0, 1]
      workers: Int, // parallel slots the cluster offers
      driverMemBytes: Long = 4L << 30, // budget for driver-side d×(d+k)
      normalEqMaxDim: Int = 2048, // hard width cap for the gram path
      blockSize: Int = 32, // block-cd column-block width
      bcdEpochs: Int = 3, // block-cd full sweeps (solver default)
      lbfgsIters: Int = 100) // MLlib LinearRegression default maxIter

  /** Per-worker dense compute rate (flops/s). */
  private val FlopSec = 1e10
  /** Per-worker memory bandwidth for a cached-data pass (bytes/s). */
  private val MemBwSec = 1e10

  /** Documented tolerance for the measured-vs-assumed constants: the
    * model only needs RATIOS right (the regime tests pin those), so a
    * calibration within this factor of the declared constant confirms
    * the declared value; outside it, update the constant. */
  val CalibrationTolerance = 100.0

  @volatile private var calSink = 0.0 // defeats dead-code elimination

  /** Measured-on-this-JVM physical constants, computed once lazily
    * (~100 ms): FlopSec from a timed Breeze gemm (the solvers' actual
    * kernel shape — dev.ludovic BLAS underneath, same as the
    * distributed gram passes) and MemBwSec from a timed contiguous
    * array sweep. Dispatch keeps the DECLARED constants by default —
    * regime ratios are what the tests pin, and a loaded box would
    * otherwise wobble the decision run to run — but [[choose]] reports
    * measured-vs-assumed alongside every cost report, and its
    * `useMeasuredCalibration` flag substitutes the measured values into
    * the pricing (the regime tests assert both dispatchers agree when
    * the ratios sit inside the window). */
  lazy val calibration: Map[String, Double] = {
    import breeze.linalg.{DenseMatrix => BDM}
    val n0 = 256
    val a = BDM.tabulate(n0, n0)((i, j) => ((i * 31 + j * 17) % 97) / 97.0)
    val b = BDM.tabulate(n0, n0)((i, j) => ((i * 13 + j * 29) % 89) / 89.0)
    calSink += (a * b).apply(0, 0) // JIT warmup
    var bestGemm = Double.MaxValue
    var r = 0
    while (r < 8) {
      val t0 = System.nanoTime()
      calSink += (a * b).apply(n0 - 1, n0 - 1)
      bestGemm = math.min(bestGemm, (System.nanoTime() - t0) / 1e9)
      r += 1
    }
    val flopSec = 2.0 * n0 * n0 * n0 / math.max(bestGemm, 1e-9)
    val arr = Array.tabulate(4 << 20)(j => (j % 31).toDouble) // 32 MB
    var bestSweep = Double.MaxValue
    r = 0
    while (r < 8) {
      val t0 = System.nanoTime()
      var s = 0.0
      var j = 0
      while (j < arr.length) { s += arr(j); j += 1 }
      calSink += s
      bestSweep = math.min(bestSweep, (System.nanoTime() - t0) / 1e9)
      r += 1
    }
    val memBw = arr.length * 8.0 / math.max(bestSweep, 1e-9)
    Map("cal_flop_sec" -> flopSec, "cal_mem_bw_sec" -> memBw,
      "assumed_flop_sec" -> FlopSec, "assumed_mem_bw_sec" -> MemBwSec)
  }
  /** Aggregation-tree network cost (s/byte at ~1 GB/s per link). */
  private val NetSecPerByte = 1e-8
  /** Fixed latency of one distributed barrier (scheduling + broadcast). */
  private val PassLatSec = 0.05
  /** A more exact solver within this factor of the cheapest wins. */
  val ExactnessWindow = 4.0

  /** Most-exact-first; index = exactness rank used for the window rule. */
  val ExactnessOrder: Seq[String] = Seq("normal", "block-cd", "l-bfgs")

  private def log2w(workers: Int): Double =
    math.log(workers.toDouble + 1.0) / math.log(2.0)

  /** Estimated seconds per solver; infeasible paths cost +∞.
    * `flopSec`/`memBwSec` default to the declared constants; [[choose]]
    * substitutes the measured calibration behind its flag. */
  def estimates(p: Problem, flopSec: Double = FlopSec,
      memBwSec: Double = MemBwSec): Map[String, Double] = {
    val FlopSec = flopSec
    val MemBwSec = memBwSec
    val n = p.n.toDouble.max(1.0)
    val d = p.d.toDouble
    val k = p.k.toDouble
    val rho = p.density.min(1.0).max(1e-6)
    val w = p.workers.toDouble.max(1.0)
    val lg = log2w(p.workers)

    val normal: Double =
      if (p.d > p.normalEqMaxDim || 8.0 * d * (d + k) > p.driverMemBytes.toDouble)
        Double.PositiveInfinity
      else
        n * d * (d + k) / (w * FlopSec) + // distributed gram + X'y
          d * d * d / FlopSec + // driver Cholesky
          n * d * 8.0 / (w * MemBwSec) + // one cached-data pass
          8.0 * d * (d + k) * lg * NetSecPerByte + // gram aggregation
          PassLatSec // one barrier

    val lbfgs: Double = {
      val perIter =
        2.0 * n * d * k * rho / (w * FlopSec) + // gradient flops over nnz
          n * d * 8.0 * rho / (w * MemBwSec) + // touch nnz (sparse rows)
          8.0 * d * k * lg * NetSecPerByte + // gradient aggregation
          PassLatSec
      p.lbfgsIters * perIter
    }

    val blockCd: Double = {
      val b = math.min(p.blockSize, p.d).toDouble
      val nBlocks = math.ceil(d / b)
      val perEpoch =
        n * d * (b + 2.0 * k) / (w * FlopSec) + // grams + residual updates
          n * d * 8.0 * (1.0 + 2.0 / b) / (w * MemBwSec) + // block cols + resid
          nBlocks * b * b * b / FlopSec + // driver block solves
          nBlocks * 8.0 * b * (b + k) * lg * NetSecPerByte + // block aggregates
          2.0 * nBlocks * PassLatSec // gram pass + residual pass per block
      p.bcdEpochs * perEpoch
    }

    Map("normal" -> normal, "l-bfgs" -> lbfgs, "block-cd" -> blockCd)
  }

  /** Per-route estimated costs and the calibration evidence, as SEPARATE
    * fields: merging them into one Map let any consumer that iterates
    * values (minBy, sum, a pretty-printed "route costs" table) silently
    * pick up non-route entries. `apply` is route-only lookup, so
    * `report("normal")` stays the per-route read it looks like. */
  case class CostReport(routeCosts: Map[String, Double],
      calibration: Map[String, Double]) {
    def apply(route: String): Double = routeCosts(route)
  }

  /** The dispatch decision plus the full cost report (for observability —
    * the estimator exposes both, the same way the chosen solver itself is
    * exposed for tests).
    *
    * `useMeasuredCalibration` stays `false` BY DESIGN (round-17 decision,
    * revisited against a default flip): wherever the flip is safe — the
    * measured/declared ratios inside the exactness window, which every
    * measured box so far has satisfied — the flagged and unflagged
    * dispatchers pick identically, so the flip changes nothing; wherever
    * it would change something, the decision would hang off a
    * once-per-JVM microbenchmark taken on a possibly-loaded box, making
    * the PHYSICAL SOLVER choice nondeterministic across JVM launches for
    * the same problem. The declared ratios are what the regime tests
    * pin; the measured evidence rides every [[CostReport]] so a caller
    * who trusts their box can opt in per call with full information. */
  def choose(p: Problem,
      useMeasuredCalibration: Boolean = false): (String, CostReport) = {
    // The flag substitutes this JVM's measured FlopSec/MemBwSec into the
    // pricing; the default keeps the declared constants (decisions must
    // not wobble run to run on a loaded box). On a box whose measured
    // ratios sit inside the documented tolerance the two dispatchers
    // agree — asserted by the regime tests.
    val costs =
      if (useMeasuredCalibration)
        estimates(p, calibration("cal_flop_sec"), calibration("cal_mem_bw_sec"))
      else estimates(p)
    val cheapest = costs.values.min
    val winner = ExactnessOrder
      .find(s => costs(s) <= cheapest * ExactnessWindow)
      .getOrElse(costs.minBy(_._2)._1)
    // measured-vs-assumed constants ride along in every report (the
    // decision itself uses the declared constants — see [[calibration]])
    (winner, CostReport(costs, calibration))
  }
}
