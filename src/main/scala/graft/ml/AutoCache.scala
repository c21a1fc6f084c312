package graft.ml

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cost-based persist insertion — the reference's headline optimizer idea
  * (AutoCacheRule, SURVEY §4): profile an intermediate's size, and cache it
  * only when (a) it is consumed by more than one downstream action/branch
  * and (b) it fits the memory budget. Catalyst never auto-persists
  * (ReuseExchange only dedupes identical exchanges within one plan), so
  * cross-branch reuse is the one place a planner outside Catalyst earns
  * its keep.
  *
  * Kept deliberately small: the decision input is Catalyst's own optimized
  * plan statistics (`sizeInBytes` propagates from parquet footers through
  * filters/projections), so no sampling pass is needed for the common case.
  */
object AutoCache {

  /** The possibly-persisted frame plus a release hook: whoever takes the
    * cache decision owns the unpersist. `release()` is a no-op when the
    * planner declined, so callers always call it (try/finally) without
    * re-checking the decision. */
  final case class CacheHandle(df: DataFrame, cached: Boolean) {
    def release(): Unit = if (cached) df.unpersist()
  }

  /** Decide-and-persist: cache `df` iff it will be consumed `uses` times
    * and its estimated size fits `memBudgetBytes`. Returns a
    * [[CacheHandle]] — the caller releases it when the consuming scope
    * ends (eager `fit()` bodies bracket with [[withCached]]; lazily
    * returned query frames must NOT persist at all and should rely on
    * exchange reuse instead, which is why the declared dedup query no
    * longer calls this).
    *
    * Plans with trustworthy Catalyst stats decide for free. Plans whose
    * stats are sentinel-derived (see [[planStats]]) are profiled WITHOUT
    * persisting (one distributed pass — [[profiledSize]]); the persist
    * happens only after an accept. Join-product estimates over honest
    * leaves routinely land in sentinel territory too (size-visitors
    * multiply child sizes when row counts are absent), so the profiling
    * path must never be allowed to write a genuinely over-budget frame
    * to storage just to learn it does not fit — declining is free now,
    * and the accept path pays one extra pass over a frame it is about
    * to cache anyway. */
  def cacheIfWorthIt(df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30): CacheHandle = {
    if (uses <= 1) return CacheHandle(df, cached = false)
    if (estimatedSize(df) <= BigInt(memBudgetBytes))
      CacheHandle(df.persist(StorageLevel.MEMORY_AND_DISK), cached = true)
    else CacheHandle(df, cached = false)
  }

  /** Bracketed form for eager multi-pass consumers: persist if worthwhile,
    * run `body` against the (possibly cached) frame, always release. */
  def withCached[T](df: DataFrame, uses: Int,
      memBudgetBytes: Long = 2L << 30)(body: DataFrame => T): T = {
    val h = cacheIfWorthIt(df, uses, memBudgetBytes)
    try body(h.df) finally h.release()
  }

  /** A frame competing for cache budget in [[selectCacheSet]]: the frame,
    * how many times the consuming scope will read it, and a label for
    * diagnostics/tests. */
  final case class Candidate(df: DataFrame, uses: Int, label: String = "")

  /** [[selectCacheSet]]'s full decision record — handles aligned with the
    * input order plus the evidence behind the knapsack: per-candidate
    * sizes and benefit-seconds (keyed by label, or the candidate index
    * when unlabeled) and the scan-bandwidth calibration
    * (measured-vs-assumed, [[scanCalibration]]) in its OWN field — never
    * merged into the per-candidate maps (the SolverCostModel.CostReport
    * discipline). */
  final case class CacheSelection(handles: Seq[CacheHandle],
      sizes: Map[String, BigInt], benefitSeconds: Map[String, Double],
      calibration: Map[String, Double])

  /** Set-selection under ONE shared budget — the reference AutoCacheRule's
    * actual shape (it picks a cache SET across the whole pipeline DAG
    * under a single memory budget via a greedy knapsack, not a per-frame
    * accept/decline; SURVEY §4). Benefit of caching a frame =
    * (uses − 1) · ESTIMATED RECOMPUTE SECONDS — the paper's runtime
    * semantics (AutoCacheRule minimizes estimated pipeline time under a
    * memory budget off sampled compute profiles), not a size proxy: an
    * expensive-to-recompute small frame must beat a cheap-to-rescan
    * giant one. Weight = size; candidates are taken in (benefit/size
    * density desc, benefit desc) order while they still fit the
    * remaining budget — a frame that does not fit is skipped rather
    * than blocking smaller frames behind it.
    *
    * The recompute-seconds estimate rides the sizing machinery for
    * free: a frame whose Catalyst stats are trustworthy is (by
    * construction — parquet footers propagated through narrow ops) a
    * scan-shaped recompute, priced at size / a scan-bandwidth constant;
    * a stat-less frame already pays the one-pass profiling sweep
    * ([[profiledSize]]), whose measured wall time IS its sampled
    * recompute cost.
    *
    * `useMeasuredBandwidth = false` (the default) prices rescans at the
    * declared [[ScanBwBytesPerSec]] — the SolverCostModel discipline:
    * decisions must not wobble run to run on a loaded box. `true`
    * substitutes this JVM's measured bandwidth ([[measuredScanBw]], one
    * lazy measurement per JVM) into the SAME pricing — on the measured-
    * 3×-slower disk this box has, a scan-shaped frame's recompute gets
    * 3× more valuable to cache, which can (and should) flip the picked
    * set against a compute-profiled rival. The flag only feeds the
    * default pricing: an injected `profiler` owns pricing outright and
    * receives the effective bandwidth as its second argument to honor
    * or ignore.
    *
    * Returns handles ALIGNED WITH THE INPUT ORDER; only selected frames
    * are persisted, and every handle's `release()` is unconditionally
    * safe (no-op for declined frames). */
  def selectCacheSet(candidates: Seq[Candidate],
      memBudgetBytes: Long = 2L << 30,
      profiler: (DataFrame, Double) => (BigInt, Double) = estimatedSizeAndCost,
      useMeasuredBandwidth: Boolean = false)
      : Seq[CacheHandle] =
    selectCore(candidates, memBudgetBytes, profiler, useMeasuredBandwidth)._1

  /** [[selectCacheSet]] with the full [[CacheSelection]] decision record.
    * `profiler` is injectable (default: [[estimatedSizeAndCost]]) so the
    * knapsack ordering is testable with deterministic (size, seconds)
    * pairs instead of wall-clock sleeps. Only THIS entry point pays the
    * one-time scan-bandwidth measurement for the REPORT —
    * [[selectCacheSet]] callers that discard the report trigger it only
    * when they opt into `useMeasuredBandwidth`. */
  def selectCacheSetReported(candidates: Seq[Candidate],
      memBudgetBytes: Long = 2L << 30,
      profiler: (DataFrame, Double) => (BigInt, Double) = estimatedSizeAndCost,
      useMeasuredBandwidth: Boolean = false)
      : CacheSelection = {
    val (handles, profiles) =
      selectCore(candidates, memBudgetBytes, profiler, useMeasuredBandwidth)
    // collision-proof report keys: labels verbatim while globally unique
    // against every OTHER key (generated or not); unlabeled candidates
    // get "#<index>"; any clash — repeated labels, or a literal label
    // that equals another candidate's generated key — appends "@<index>"
    // until free ("@i" is unique per candidate, so this terminates)
    val keys: Map[Int, String] = {
      val bases = candidates.indices.map { i =>
        if (candidates(i).label.nonEmpty) candidates(i).label else s"#$i"
      }
      val used = scala.collection.mutable.Set.empty[String]
      candidates.indices.map { i =>
        var k = bases(i)
        // a base repeated later would steal this one's verbatim claim —
        // only the FIRST holder of a base keeps it bare
        if (bases.indexOf(k) != i) k = s"$k@$i"
        while (!used.add(k)) k = s"$k@$i"
        i -> k
      }.toMap
    }
    val cal =
      if (candidates.nonEmpty)
        scanCalibration(candidates.head.df.sparkSession)
      else Map.empty[String, Double]
    CacheSelection(handles,
      sizes = profiles.map { case (i, (s, _)) => keys(i) -> s },
      benefitSeconds = profiles.map { case (i, (_, sec)) =>
        keys(i) -> (candidates(i).uses - 1).toDouble * sec
      },
      calibration = cal)
  }

  private def selectCore(candidates: Seq[Candidate], memBudgetBytes: Long,
      profiler: (DataFrame, Double) => (BigInt, Double),
      useMeasuredBandwidth: Boolean)
      : (Seq[CacheHandle], Map[Int, (BigInt, Double)]) = {
    // the measurement is one lazy JVM-wide pass; still, only pay it when
    // something will actually be priced
    lazy val effBw =
      if (useMeasuredBandwidth) measuredScanBw(candidates.head.df.sparkSession)
      else ScanBwBytesPerSec
    // profile ONLY the uses > 1 candidates: the rest are filtered out of
    // the greedy order and can never be selected, and profiling a
    // stat-less frame is a full distributed pass — paid for nothing on a
    // never-cacheable candidate
    val profiles: Map[Int, (BigInt, Double)] = candidates.indices
      .filter(i => candidates(i).uses > 1)
      .map(i => i -> profiler(candidates(i).df, effBw)).toMap
    val order = candidates.indices
      .filter(i => candidates(i).uses > 1)
      .sortBy { i =>
        val (size, seconds) = profiles(i)
        val benefit = (candidates(i).uses - 1).toDouble * seconds
        val density = benefit / size.toDouble.max(1.0)
        (-density, -benefit)
      }
    var remaining = BigInt(memBudgetBytes)
    val chosen = scala.collection.mutable.BitSet.empty
    order.foreach { i =>
      if (profiles(i)._1 <= remaining) { chosen += i; remaining -= profiles(i)._1 }
    }
    val handles = candidates.indices.map { i =>
      if (chosen(i))
        CacheHandle(candidates(i).df.persist(StorageLevel.MEMORY_AND_DISK),
          cached = true)
      else CacheHandle(candidates(i).df, cached = false)
    }
    (handles, profiles)
  }

  /** Bracketed form of [[selectCacheSet]]: select under the shared budget,
    * run `body` against the (selectively cached) frames in input order,
    * always release all handles. */
  def withCachedSet[T](candidates: Seq[Candidate],
      memBudgetBytes: Long = 2L << 30,
      useMeasuredBandwidth: Boolean = false)(body: Seq[DataFrame] => T): T = {
    val hs = selectCacheSet(candidates, memBudgetBytes,
      useMeasuredBandwidth = useMeasuredBandwidth)
    try body(hs.map(_.df)) finally hs.foreach(_.release())
  }

  /** Catalyst's optimized-plan size estimate, or None when it is
    * sentinel-derived and therefore meaningless.
    *
    * An RDD-backed scan (the CIFAR binary loader, any `rdd.toDF`) reports
    * `defaultSizeInBytes` (Long.MaxValue by default); visitors then SCALE
    * that sentinel — a column-narrowing projection multiplies it by the
    * row-width ratio, a join by the other side — so the poisoned value
    * can land anywhere huge, not only at or above the sentinel itself.
    * Both screens are needed: `>= defaultSizeInBytes` catches
    * sentinel-preserving plans even when the conf is tuned low (a common
    * broadcast-join knob), and the absolute [[SaneStatsCeiling]] catches
    * scaled-down sentinel descendants — no honest single-frame estimate
    * reaches a pebibyte. */
  private[graft] def planStats(df: DataFrame): Option[BigInt] = {
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val sentinelDerived =
      stats >= BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes) ||
        stats >= SaneStatsCeiling
    if (sentinelDerived) None else Some(stats)
  }

  private val SaneStatsCeiling = BigInt(1L << 50) // 1 PiB

  /** Estimated size (bytes) — exposed for tests and for pipeline authors
    * deciding block sizes: Catalyst's estimate when trustworthy, else the
    * reference's profiling behavior ([[profiledSize]]). */
  def estimatedSize(df: DataFrame): BigInt =
    planStats(df).getOrElse(profiledSizeAndTime(df)._1)

  /** Modeled re-scan bandwidth for a frame whose recompute is
    * scan-shaped (trustworthy Catalyst stats = parquet + narrow ops):
    * local-disk parquet at ~1 GB/s. Only the RATIO against measured
    * profile seconds matters for the knapsack ordering. The DECISION
    * keeps this declared constant (the SolverCostModel discipline — a
    * loaded box would wobble selections run to run), but every
    * [[CacheSelection]] report carries the measured value
    * ([[scanCalibration]]) so the constant is auditable evidence, not
    * an article of faith. */
  private[graft] val ScanBwBytesPerSec = 1e9

  /** Measured-on-this-JVM scan bandwidth for measured-in-decision pricing
    * ([[selectCacheSet]]'s `useMeasuredBandwidth`): the [[scanCalibration]]
    * value, behind a test-only override so decision tests pin the
    * measured/declared ratio deterministically instead of inheriting
    * whatever this box's disk does under load. The override affects
    * DECISIONS only — the [[CacheSelection]] calibration field always
    * carries the genuinely measured evidence. */
  private[graft] def measuredScanBw(
      spark: org.apache.spark.sql.SparkSession): Double =
    measuredBwOverrideForTests.getOrElse(
      scanCalibration(spark)("cal_scan_bw_bytes_sec"))

  @volatile private[graft] var measuredBwOverrideForTests: Option[Double] =
    None

  @volatile private var calSink = 0.0 // defeats dead-code elimination
  @volatile private var scanCal: Map[String, Double] = null

  /** Measured-on-this-JVM scan bandwidth, computed once lazily: writes
    * ~48 MB of incompressible (hashed) longs to a temp-dir parquet,
    * times full-column scans of it (best of 3 after one warm run), and
    * reports disk-bytes/second against the declared constant. The temp
    * files are deleted after the measurement. */
  private[graft] def scanCalibration(
      spark: org.apache.spark.sql.SparkSession): Map[String, Double] = {
    var c = scanCal
    if (c == null) synchronized {
      if (scanCal == null) scanCal = measureScanBw(spark)
      c = scanCal
    }
    c
  }

  private def measureScanBw(
      spark: org.apache.spark.sql.SparkSession): Map[String, Double] = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-scan-cal")
    try {
      val path = dir.resolve("cal.parquet").toString
      spark.range(0L, 2L << 20).select(
        xxhash64(col("id")).as("a"),
        xxhash64(col("id"), lit(1)).as("b"),
        xxhash64(col("id"), lit(2)).as("c"))
        .coalesce(4).write.mode("overwrite").parquet(path)
      val walkSize = java.nio.file.Files.walk(dir)
      val bytes =
        try walkSize.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map(java.nio.file.Files.size(_): Long).sum
        finally walkSize.close()
      val df = spark.read.parquet(path)
      var best = Double.MaxValue
      var r = 0
      while (r < 4) {
        val t0 = System.nanoTime()
        calSink += df.select(avg(hash(col("a"), col("b"), col("c"))))
          .head().getDouble(0)
        val dt = (System.nanoTime() - t0) / 1e9
        if (r > 0) best = math.min(best, dt) // run 0 warms codegen/IO
        r += 1
      }
      Map("cal_scan_bw_bytes_sec" -> bytes.toDouble / math.max(best, 1e-9),
        "assumed_scan_bw_bytes_sec" -> ScanBwBytesPerSec)
    } finally {
      val walkDel = java.nio.file.Files.walk(dir)
      try walkDel.sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walkDel.close()
    }
  }

  /** Does the optimized plan carry compute Catalyst cannot price — a
    * Scala UDF/UDAF or an object-mapping operator (mapPartitions etc.)?
    * Trusted stats on such a plan still describe BYTES honestly, but the
    * scan-priced recompute model does not: an expensive narrow UDF over
    * a parquet scan yields trusted stats AND an arbitrarily costly
    * recompute, the exact inversion the runtime-benefit knapsack exists
    * to fix — so [[estimatedSizeAndCost]] falls through to measured
    * profiling for these plans. */
  private[graft] def hasOpaqueCompute(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.exists {
      case _: ObjectProducer | _: ObjectConsumer => true
      case node => node.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
        case _: org.apache.spark.sql.execution.aggregate.ScalaAggregator[_, _, _] => true
        case _ => false
      })
    }
  }

  /** (size bytes, estimated recompute seconds) — the knapsack's two
    * inputs off ONE sizing decision: stats-backed frames price a
    * re-scan at `scanBw` bytes/sec (declared or measured — the caller's
    * [[selectCacheSet]] flag decides); stat-less frames — AND
    * stats-backed frames carrying opaque compute ([[hasOpaqueCompute]]),
    * whose recompute cost a scan model cannot see — return the measured
    * wall time of the profiling pass (the reference's sampled per-node
    * compute profile), which no bandwidth constant touches. */
  private[graft] def estimatedSizeAndCost(df: DataFrame, scanBw: Double)
      : (BigInt, Double) =
    planStats(df) match {
      case Some(size) if !hasOpaqueCompute(df) =>
        (size, size.toDouble / scanBw)
      case _ => profiledSizeAndTime(df)
    }

  /** Declared-constant convenience form (tests, ad-hoc sizing). */
  private[graft] def estimatedSizeAndCost(df: DataFrame): (BigInt, Double) =
    estimatedSizeAndCost(df, ScanBwBytesPerSec)

  private val SamplePerPartition = 8

  /** Profile a frame's size in ONE distributed pass, persisting nothing:
    * exact row count plus the first few row widths of EVERY partition.
    * Sampling every partition matters — a width-skewed layout (data
    * sorted by document/array length) makes a driver-side `head(100)`
    * sample, which only ever sees the first partition, lie badly in
    * either direction. The width average is computed in Double (no
    * integer truncation) before scaling by the count.
    *
    * Also returns the pass's wall seconds: the pass executes the
    * frame's full plan, so its duration is a direct sample of the
    * recompute cost a cache hit saves. */
  private def profiledSizeAndTime(df: DataFrame): (BigInt, Double) = {
    val t0 = System.nanoTime()
    val size = profiledSize(df)
    (size, (System.nanoTime() - t0) / 1e9)
  }

  private def profiledSize(df: DataFrame): BigInt = {
    val (n, widthSum, widthCnt) = df.rdd
      .mapPartitions { it =>
        var rows = 0L; var ws = 0.0; var wc = 0L
        it.foreach { r =>
          rows += 1L
          if (wc < SamplePerPartition) { ws += rowBytes(r).toDouble; wc += 1L }
        }
        Iterator.single((rows, ws, wc))
      }
      .fold((0L, 0.0, 0L)) { case ((an, aw, ac), (bn, bw, bc)) =>
        (an + bn, aw + bw, ac + bc)
      }
    if (n == 0L || widthCnt == 0L) BigInt(0)
    else BigDecimal(widthSum / widthCnt * n.toDouble).toBigInt
  }

  /** Crude per-row heap footprint — a cost-model input, not an exact
    * accounting. */
  private def rowBytes(r: org.apache.spark.sql.Row): Long =
    16L + r.toSeq.iterator.map {
      case null => 1L
      case _: Boolean | _: Byte => 1L
      case _: Short => 2L
      case _: Int | _: Float => 4L
      case _: Long | _: Double => 8L
      case s: String => 8L + s.length
      case a: Array[Byte] => 8L + a.length
      case xs: scala.collection.Seq[_] => 8L + xs.length * 8L
      case m: scala.collection.Map[_, _] => 8L + m.size * 16L
      case nested: org.apache.spark.sql.Row => rowBytes(nested)
      case d: java.math.BigDecimal => 16L + d.precision()
      case _ => 16L
    }.sum
}
