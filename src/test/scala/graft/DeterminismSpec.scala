package graft

import org.scalatest.funsuite.AnyFunSuite

/** THE determinism property (SURVEY §2.10 / §5.2): a query's collected
  * result must be identical under different shuffle partitionings — if it
  * isn't, the driver's hash compare is a coin flip. Covers one query per
  * operator family plus every float-sensitive query. */
class DeterminismSpec extends AnyFunSuite with SparkFixture {

  private val sensitive = Seq(
    "q_agg_hash", "q_join_inner", "q_join_full", "q_join_asof",
    "q_win_lag", "q_win_frame", "q_win_running", "q_math_funcs",
    "q_stream_tumble", "q_stream_slide", "q_stream_session", "q_stream_dedup",
    "q_knn_cosine", "q_sim_jaccard", "q_embed_neardup", "q_ann_ivf",
    "q_text_fingerprint", "q_text_quality", "q_dedup_minhash", "q_dedup_simhash",
    "q_subq_scalar", "q_topk_group", "q_agg_rollup", "q_pivot",
    "q_ngram_jaccard", "q_agg_quantile", "q_sample_split", "q_part_prune",
    "q_dedup_cluster", "q_text_norm",
    // round-3 additions: the salted two-phase sum (decimal ⇒ order-free),
    // the sketch quantiles (mergeable summary — invariance is the CLAIM),
    // the hyperplane buckets, and the window/grid/top-k newcomers
    "q_agg_salted", "q_agg_quantile_approx", "q_ann_hplsh", "q_shard_pack",
    "q_ts_gapfill", "q_text_tfidf", "q_sample_stratified", "q_unpivot",
    "q_subq_exists", "q_text_pii",
    // round-3 continuation: salted/bloom joins (must equal their plain
    // twins under any partitioning), integer k-means and correlation
    // (exactness IS the claim), the CC clusterings, the interpolation and
    // EWMA folds (float order pinned by construction), and the rest
    "q_join_salted", "q_join_bloom", "q_agg_mode", "q_zorder",
    "q_dedup_semantic", "q_text_containment", "q_kmeans_lloyd",
    "q_ts_interp", "q_funnel", "q_retention", "q_agg_corr", "q_win_ewma",
    "q_graph_triangles", "q_agg_incremental", "q_profile_skew",
    "q_profile_stats", "q_pipeline_prepare", "q_join_bucketed",
    "q_text_editdist",
    // round-8 sixth continuation: the detection tier (exact-BIGINT
    // statistics whose exactness IS the claim), the float_dot
    // contamination screen, the unrolled LPA rounds and the LPM joins
    "q_conc_gini", "q_scan_hhi", "q_bot_cadence", "q_change_cusum",
    "q_outage_maxgap", "q_rate_peak", "q_contam_semantic", "q_graph_lpa",
    "q_churn", "q_seq_transitions", "q_ip_lpm")

  for (name <- sensitive) {
    test(s"$name is invariant under shuffle partitioning") {
      val fn = SparkEntry.queries(name)
      // clear both cache layers between runs: queries that persist()
      // internal frames (SetSimilarity sets, LSH signatures, pair joins)
      // would otherwise serve run 2 from run 1's cache, making the
      // invariance check vacuous exactly on the float-sensitive stages;
      // cleared after too so caches don't accumulate across the suite
      def cleanCaches(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      try {
        cleanCaches()
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = fn(spark, sf).collect().toSeq
        cleanCaches()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = fn(spark, sf).collect().toSeq
        assert(a.nonEmpty, s"$name returned an empty result (masks bugs)")
        assert(a == b, s"$name differs across partitionings")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        cleanCaches()
      }
    }
  }

  test("every declared oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
