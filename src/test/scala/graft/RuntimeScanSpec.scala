package graft

/** Runtime scan-count smoke over the round-18 repeat-scan adjudications:
  * the static ≤3-scan guard (PlanShapeSpec) counts parquet Locations in
  * the FINAL plan text, but an eager localCheckpoint replaces its
  * upstream scans with a LogicalRDD at DataFrame-CONSTRUCTION time, so
  * every scan feeding a checkpointed grid is invisible to that guard —
  * exactly the queries the round-18 ReuseAudit campaign rewrote. This
  * spec closes the blind spot with a listener: a QueryExecutionListener
  * observes EVERY execution the session fires while a query is
  * constructed and collected — the eager checkpoint builds run through
  * `Dataset.withAction` and fire it just like the main collect — and the
  * per-table totals across all of them are the query's true runtime
  * parquet-scan counts. The adjudicated counts (ReuseAudit, SURVEY §8
  * round 18: NB = 3 corpus passes, spearman = 1 fact scan, the
  * contingency/bin grids = 1, isotonic at its 2-pass minimum, the set-op
  * multisets = 2) are pinned here so a planner change or a refactor that
  * silently re-derives a bounded relation per consumer fails CI instead
  * of surfacing three rounds later in a bench drift ledger.
  *
  * Known residual blind spot (documented, accepted): a LAZY checkpoint
  * (q_boilerplate_frac, q_tfidf_top_terms) materializes inside the main
  * job without its own QueryExecution, so its internal scan is invisible
  * to BOTH instruments — but RDD block semantics already guarantee it
  * runs exactly once per materialization, which is the property the
  * lazy checkpoint was chosen for.
  */
class RuntimeScanSpec extends GraftSuite {

  // Every pin below — and PlanShapeSpec's static exceptions map — encodes
  // SPARK 4.1.2 PLANNER BEHAVIOR (how many executions a checkpoint build
  // fires, where AQE reuses an exchange, which subtrees replan). A Spark
  // upgrade must fail HERE, once, with instructions — not as 20+
  // mysterious pin failures (verdict-19 stretch #6). Re-adjudication
  // recipe on upgrade: (1) `runMain graft.RuntimeScanAudit` (full
  // surface, writes RUNTIME_SCANS.json) and diff against the committed
  // round artifact; (2) `SPARK_GRAFT_JOBS=1 runMain graft.RuntimeScanAudit
  // q_boilerplate_frac q_tfidf_top_terms` twice; (3) adjudicate every
  // delta (plan improvement? regression? instrument change?), update the
  // pins AND PlanShapeSpec's exceptions map, then bump this constant.
  private val adjudicatedSparkVersion = "4.1.2"
  test("scan/job pins were adjudicated under THIS Spark version") {
    assert(spark.version == adjudicatedSparkVersion,
      s"Spark ${spark.version} != $adjudicatedSparkVersion: the runtime " +
        "scan/job pins and PlanShapeSpec's exceptions map encode the old " +
        "planner — re-adjudicate (recipe in RuntimeScanSpec) before " +
        "trusting or updating any pin")
  }

  /** Per-table parquet-scan totals across every QueryExecution fired
    * while constructing + collecting `name` (checkpoint builds, dispatch
    * counts, the main action — everything on this session). The
    * instrument itself lives in [[graft.RuntimeScans]], shared with the
    * whole-surface [[graft.RuntimeScanAudit]] main. */
  private def runtimeScans(name: String): Map[String, Int] =
    RuntimeScans.measure(spark)(SparkEntry.queries(name)(spark, sf))

  // The pinned adjudications: query -> exact per-table runtime scan
  // totals. Deliberately EXACT (not <=): a count DROPPING below the
  // adjudicated floor would mean the instrument stopped seeing real work
  // (a silent lazy-checkpoint conversion, a listener regression), which
  // is as much a measurement bug as a rise is a plan regression.
  private val adjudicated: Map[String, Map[String, Int]] = Map(
    "q_naive_bayes_score" -> Map("documents" -> 3),
    "q_spearman" -> Map("lineitem" -> 1),
    // preds derives entirely from embeddings; the confusion grid is the
    // one corpus pass
    "q_cohens_kappa" -> Map("embeddings" -> 1),
    "q_ks_test" -> Map("documents" -> 1),
    "q_psi" -> Map("documents" -> 1),
    "q_source_kl" -> Map("documents" -> 1),
    "q_length_drift" -> Map("documents" -> 1),
    "q_mutual_information" -> Map("documents" -> 1),
    "q_cramers_v" -> Map("documents" -> 1),
    "q_jensen_shannon" -> Map("documents" -> 1),
    // nation arrives via c_nationkey, never its own scan
    "q_t_closeness" -> Map("customer" -> 1),
    // min-max pass + binning pass — the isotonic family's 2-pass minimum
    "q_calibration_ece" -> Map("embeddings" -> 2),
    "q_isotonic_fit" -> Map("embeddings" -> 2),
    // mm + grid agg + serve (round-19 listener-audit find: the serve
    // plan re-derived mm until the 1-row checkpoint; was 4)
    "q_isotonic_apply" -> Map("embeddings" -> 3),
    // per-customer days pass + study-end pass; ntot is an exact re-sum
    // of the materialized duration grid (round-19 find; was 4)
    "q_kaplan_meier" -> Map("orders" -> 2),
    // one scan per materialized side multiset (Relational.scala Scaladoc)
    "q_set_ops" -> Map("customer" -> 1, "orders" -> 1),
    "q_set_ops_all" -> Map("customer" -> 2, "orders" -> 2),
    // cohort-table build + the fact join: "two event scans instead of
    // three" (Sessions.scala)
    "q_cohort_ltv" -> Map("events" -> 2),
    "q_cohort_retention" -> Map("events" -> 2),
    // eval-slice checkpoint build + the deliberately-lazy train side +
    // the doc spine (Similarity.scala: "tr stays lazy")
    "q_ngram_coverage" -> Map("documents" -> 3))

  adjudicated.toSeq.sortBy(_._1).foreach { case (name, expected) =>
    test(s"$name runtime parquet-scan counts match the adjudication") {
      val measured = runtimeScans(name)
      assert(measured == expected,
        s"$name runtime scans drifted from the round-18 adjudication: " +
          s"measured $measured, adjudicated $expected — re-run " +
          "graft.ReuseAudit, re-adjudicate, and update BOTH this pin and " +
          "PlanShapeSpec's static exceptions map if the change is intended")
    }
  }

  // The committed round artifact (RUNTIME_SCANS_r*.json, written by
  // RuntimeScanAudit at the same sf0.001 these pins run at) must agree
  // with the pins above: a re-adjudicated pin without a regenerated
  // artifact — or vice versa — would leave the "one-line diff" story
  // stale. Reads the NEWEST committed artifact; skips if none exists.
  test("the committed runtime-scan artifact agrees with the CI pins") {
    val dir = new java.io.File(".")
    // newest = highest ROUND NUMBER, not lexicographic filename order
    // (which would put r100 before r99 and silently validate against a
    // stale artifact across the digit-count boundary)
    val arts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("RUNTIME_SCANS_r\\d+\\.json"))
      .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
    assume(arts.nonEmpty, "no committed RUNTIME_SCANS artifact")
    val txt = new String(java.nio.file.Files.readAllBytes(
      arts.last.toPath), java.nio.charset.StandardCharsets.UTF_8)
    // the pins are adjudicated at THIS suite's scale — an artifact
    // regenerated at another sf (Bench's default is sf0.1) could agree
    // on the 20 pinned rows while its other ~260 rows encode wrong-scale
    // dispatch arms; refuse it outright
    assert(txt.contains("\"sf\": \"" + sf + "\""),
      s"${arts.last.getName} was not generated at $sf — regenerate with " +
        s"SPARK_GRAFT_SF_DIR=$sf runMain graft.RuntimeScanAudit")
    // artifact values are flat {"table":n,...} objects per query
    def entry(q: String): Map[String, Int] = {
      val re = ("\"" + q + "\": \\{([^}]*)\\}").r
      re.findFirstMatchIn(txt).map { m =>
        """"(\w+)":(\d+)""".r.findAllMatchIn(m.group(1))
          .map(x => x.group(1) -> x.group(2).toInt).toMap
      }.getOrElse(Map.empty)
    }
    adjudicated.foreach { case (q, pin) =>
      assert(entry(q) == pin,
        s"${arts.last.getName} disagrees with the pin for $q: artifact " +
          s"${entry(q)}, pin $pin — re-run graft.RuntimeScanAudit and " +
          "commit a fresh artifact alongside any pin change")
    }
  }

  // The LAZY-checkpoint blind spot, closed with the instrument that IS
  // deterministic (verdict-19 #2): a lazy localCheckpoint materializes
  // inside the main job with no QueryExecution of its own — invisible to
  // the scan listener and to plan text — but every materialization IS a
  // Spark job, so the total job count of construct+collect pins it. A
  // bytes-read (task inputMetrics) ceiling was tried first and measured
  // unusable (negative-result note in graft.RuntimeScans). Counts
  // adjudicated via `SPARK_GRAFT_JOBS=1 runMain graft.RuntimeScanAudit`
  // at sf0.001 under the same local[4]/4-shuffle-partition config as
  // this suite, twice each, stable: boilerplate = 12 (the lazy
  // shingle-relation checkpoint + dispatch counts + AQE final jobs),
  // tfidf = 10. EXACT for the same reason as the scan pins: a DROP
  // means a materialization silently vanished (the lazy checkpoint
  // converted or dead), a RISE means something re-materializes.
  private val jobPins: Map[String, Int] = Map(
    "q_boilerplate_frac" -> 12,
    "q_tfidf_top_terms" -> 10)

  jobPins.toSeq.sortBy(_._1).foreach { case (name, expected) =>
    test(s"$name fires exactly $expected jobs (lazy-checkpoint pin)") {
      val measured = RuntimeScans.countJobs(spark)(
        SparkEntry.queries(name)(spark, sf))
      assert(measured == expected,
        s"$name job count drifted: measured $measured, adjudicated " +
          s"$expected — re-run SPARK_GRAFT_JOBS=1 graft.RuntimeScanAudit " +
          "twice, adjudicate the delta (a new materialization? a lost " +
          "one?), and update this pin if the change is intended")
    }
  }
}
