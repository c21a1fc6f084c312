package graft

import org.apache.spark.sql.DataFrame

/** SURVEY §5 item 4: results must be identical under different parallelism.
  * Runs a representative query set twice — once at the fixture's 4 shuffle
  * partitions and once repartitioned to a skewed layout — and compares the
  * full ordered result. (The driver's own probe re-runs Verify at a
  * different SPARK_GRAFT_CPUS; this is the in-suite equivalent.) */
class DeterminismSpec extends GraftSuite {

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.mkString("|"))

  private def checkStable(name: String): Unit = {
    val fn = SparkEntry.queries(name)
    val a = canonical(fn(spark, sf))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = canonical(fn(spark, sf))
      assert(a == b, s"$name changed under different shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  Seq(
    "q_agg_pricing_summary",
    "q_window_running",
    "q_tfidf_top_terms",
    "q_word_id_encode",
    "q_dedup_shingle_jaccard",
    "q_dedup_minhash",
    "q_ann_ivf",
    "q_embed_neardup",
    "q_naive_bayes_score",
    "q_sessionize",
    "q_bm25",
    "q_shingle_cosine",
    "q_source_temperature",
    "q_pagerank",
    "q_winsorize",
    "q_gap_fill",
    // round-6 additions: the ranking (zipWithIndex), sketch, graph, and
    // sliding-distinct families are the most partitioning-sensitive shapes
    "q_revenue_gini",
    "q_cm_heavy_hitters",
    "q_lsh_quality",
    "q_triangle_count",
    "q_label_prop",
    "q_rolling_actives",
    "q_semantic_clusters",
    // round-7 additions: the distinct-pair profile shuffle, the two CDC
    // full-outer-join shapes, and the SCD2 run-id window chain
    "q_column_profile",
    "q_upsert_snapshot",
    "q_snapshot_diff",
    "q_scd2_intervals",
    // round-8 additions: banded-Hamming blocking, cluster keep-policy,
    // the IVF-PQ composition, the BPE kernel's vocab aggregation, and
    // the grid-joined variational distance
    "q_simhash_neardup",
    "q_dedup_keep_best",
    "q_ann_ivfpq",
    "q_bpe_apply",
    "q_decontam_ngram",
    "q_t_closeness",
    "q_pretokenize",
    "q_welch_ttest",
    "q_stream_join",
    "q_session_window",
    // round-9 additions: the distributed-prefix survival curve, the
    // same-second-tie TWAP window, the capped-block fuzzy join, the
    // probe-ranking NDCG, and the OLS/drawdown daily grids
    "q_kaplan_meier",
    "q_twap",
    "q_fuzzy_join",
    "q_eval_ndcg",
    "q_trend_slope",
    "q_drawdown",
    // late round-9: zipWithIndex prefix consumers (seasonal, Theil-Sen),
    // the hash-seeded bootstrap, union-find entity resolution, and the
    // vocab-join OOV audit
    "q_seasonal_decompose",
    "q_theil_sen",
    "q_bootstrap_se",
    "q_entity_resolution",
    "q_oov_rate",
    // round-12 additions: the remaining float-assembly queries whose
    // siblings were already listed — the ANOVA float ssb sum, the ±7-day
    // lead-lag correlation grid, and the HHI share-of-squares assembly
    "q_anova",
    "q_lead_lag",
    "q_hhi").foreach { name =>
    test(s"$name is partitioning-invariant") { checkStable(name) }
  }
}
