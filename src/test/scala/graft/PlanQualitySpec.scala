package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts (SURVEY §4): the properties that decide whether
  * a plan survives a 100× scale-up are asserted here, not just eyeballed —
  * predicate pushdown reaching the parquet scan, column pruning in
  * ReadSchema, broadcast joins on dims, TakeOrderedAndProject for
  * sort+limit, and two-phase (partial/final) aggregation inside
  * whole-stage codegen. */
class PlanQualitySpec extends AnyFunSuite with SparkFixture {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE so assertions see the real plan
    df.queryExecution.executedPlan.toString
  }

  test("q_filter_pred: predicates and pruning reach the parquet scan") {
    val plan = executedPlan("q_filter_pred")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_ship"), "range not pushed")
    // column pruning: the scan reads only the 6 referenced columns
    assert(!plan.contains("l_suppkey"), "scan reads unreferenced columns")
  }

  test("q_join_broadcast: all three dim joins are broadcast hash joins") {
    val plan = executedPlan("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, s"expected 3 BHJ:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dim join fell back to SMJ")
  }

  test("q_sort_multi: sort+limit fuses into TakeOrderedAndProject") {
    val plan = executedPlan("q_sort_multi")
    assert(plan.contains("TakeOrderedAndProject(limit=100"), s"no TOAP:\n$plan")
  }

  test("q_sample_bottomk: bottom-k sample is TOAP, no global sort, no window") {
    val plan = executedPlan("q_sample_bottomk")
    assert(plan.contains("TakeOrderedAndProject(limit=200"), s"no TOAP:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("q_mm_frames / q_log_parse: narrow fanout stages — no shuffle below the final sort/agg") {
    // frame sampling: the only exchange is the output ORDER BY's range
    // partitioning; parse: one aggregate exchange over 6 groups
    val frames = executedPlan("q_mm_frames")
    assert(frames.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"frame sampling should shuffle only for the final order:\n$frames")
    val parse = executedPlan("q_log_parse")
    assert(!parse.contains("CartesianProduct") && !parse.contains("SortMergeJoin"),
      s"parse stage must stay join-free:\n$parse")
  }

  test("q_ab_welch / q_trend_ols: one agg scan + 1-row broadcast baseline, no SMJ") {
    // the statistical gates' scale contract: sufficient statistics from
    // ONE two-phase aggregation over the scan; the baseline/recentre
    // frame joins as a broadcast (1 row), never a shuffle join
    for (q <- Seq("q_ab_welch", "q_trend_ols")) {
      val plan = executedPlan(q)
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
        s"$q: baseline must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        s"$q: no shuffle join allowed:\n$plan")
      assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
        s"$q: expected two-phase hash aggregation:\n$plan")
    }
  }

  test("q_agg_cms: sketch aggregation keeps a map-side partial phase") {
    val plan = executedPlan("q_agg_cms")
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg:\n$plan")
    assert(plan.contains("partial_countminsketch") ||
      plan.toLowerCase.contains("partial_cms") ||
      plan.contains("partial_"),
      s"no partial (map-side) sketch phase:\n$plan")
  }

  test("q_agg_hash: two-phase hash aggregation inside whole-stage codegen") {
    val plan = executedPlan("q_agg_hash")
    assert(plan.contains("partial_sum"), "no map-side partial aggregation")
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plan).isDefined,
      s"aggregate outside whole-stage codegen:\n$plan")
  }

  test("q_part_prune: day range appears as PartitionFilters, not a row filter") {
    val plan = executedPlan("q_part_prune")
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition filter:\n$plan")
    assert(plan.contains("(day"), "day bounds missing from partition filters")
  }

  test("InferJaccardSizeBound: optimizer injects the size-ratio prune from the threshold") {
    val df = SparkEntry.queries("q_sim_jaccard")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the bound is derived, not hand-written in SetSimilarity anymore
    assert(optimized.contains("(cast(size("),
      s"no injected size bound in optimized plan:\n$optimized")
    assert(optimized.contains("* 10000)") && optimized.contains("* 8000)"),
      s"bound terms missing:\n$optimized")
    assert(df.count() > 0)
  }

  test("OrderCostlyPredicatesLast: pair-dedup comparison precedes the dot product") {
    val df = SparkEntry.queries("q_embed_neardup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val cond = plan.linesIterator.find(_.contains("float_dot")).getOrElse("")
    val cheapAt = cond.indexOf("da")
    val costlyAt = cond.indexOf("float_dot")
    assert(cheapAt >= 0 && costlyAt > cheapAt,
      s"da<db does not precede float_dot in: $cond")
    assert(df.count() > 0)
  }

  test("q_knn_cosine / q_ann_ivf: the query side broadcasts, never the corpus") {
    for (name <- Seq("q_knn_cosine", "q_ann_ivf")) {
      val plan = executedPlan(name)
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
        s"$name: no broadcast of the 10-row query side:\n$plan")
    }
  }

  test("q_ann_pq: codebook and query LUT broadcast; scoring never joins all pairs") {
    // PQ/ADC's scale contract: the only joins are (a) corpus dims against
    // the broadcast 640-row codebook and (b) corpus codes against the
    // broadcast 800-row query LUT — both map-side. A plan that shuffles
    // or nested-loops vector pairs has lost the compression's point.
    val plan = executedPlan("q_ann_pq")
    assert("BroadcastExchange|BroadcastQueryStage".r.findAllIn(plan).size >= 2 ||
      ("BroadcastHashJoin".r.findAllIn(plan).size >= 2),
      s"q_ann_pq: codebook and LUT must both broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), "no all-pairs scoring")
    assert(!plan.contains("SortMergeJoin"),
      s"q_ann_pq: no shuffled join belongs in the ADC path:\n$plan")
  }

  test("q_ann_ivfpq: the cell prune rides the LUT join's equi keys") {
    // IVFPQ's composition contract: the ADC scoring join must be keyed by
    // (cell, subspace, codeword) — candidates outside the query's coarse
    // cell are pruned BY THE JOIN, never scored-then-filtered — and both
    // small sides (codebook, LUT) broadcast; a pair shuffle or cartesian
    // loses the inverted-list economics.
    val df = SparkEntry.queries("q_ann_ivfpq")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val lutJoin = plan.linesIterator
      .find(l => l.contains("BroadcastHashJoin") && l.contains("code")).getOrElse("")
    assert(lutJoin.contains("lb") && lutJoin.contains("la"),
      s"cell key missing from the ADC join's equi keys: $lutJoin\n$plan")
    assert(!plan.contains("CartesianProduct"), "no all-pairs scoring")
    assert(!plan.contains("SortMergeJoin"),
      s"q_ann_ivfpq: no shuffled join belongs in the ADC path:\n$plan")
    assert(df.count() > 0)
  }

  test("q_ann_refine: exact re-rank joins a broadcast shortlist, never the corpus") {
    // Two-stage serve contract: the refine step's exact-cosine pass must
    // probe the corpus with the BROADCAST shortlist (≤ probes×10 rows) —
    // a shuffled or cartesian exact pass would pay the corpus-sized exact
    // scoring the PQ stage exists to avoid.
    val plan = executedPlan("q_ann_refine")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast refine join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"all-pairs exact pass:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"refine must not shuffle the corpus against the shortlist:\n$plan")
  }

  test("q_mix_temperature: derived rates broadcast; audit aggregation stays two-phase") {
    // The weights/rates frames are |langs|-row: they must reach the keep
    // pass as broadcasts (a shuffled rate join would re-partition the
    // corpus scan), and the audit agg must keep its map-side partial.
    val plan = executedPlan("q_mix_temperature")
    assert(plan.contains("BroadcastHashJoin"), s"rates not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for rates:\n$plan")
    assert("partial_(count|sum)".r.findFirstIn(plan).isDefined,
      s"no partial agg phase:\n$plan")
  }

  test("q_like_trgm: pattern dims broadcast end to end; corpus never shuffles for candidates") {
    // Index-query contract: the gram→pattern mapping and the count-match
    // dim are tiny — they must broadcast; a shuffled join would
    // re-partition the corpus-sized posting frame per query.
    val plan = executedPlan("q_like_trgm")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"pattern dims not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"all-pairs:\n$plan")
  }

  test("q_agg_salted: both phases keep map-side partial aggregation") {
    // four HashAggregates (partial+final per phase): the salted phase
    // shuffles on (key, salt) and the re-aggregation on key alone — the
    // hot key never lands whole on one reducer
    val plan = executedPlan("q_agg_salted")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"expected 2 two-phase aggregates:\n$plan")
    assert(plan.contains("partial_sum"), "no map-side combine")
    assert("_salt".r.findAllIn(plan).nonEmpty, "salt column absent from plan")
  }

  test("q_agg_quantile_approx: sketches aggregate partially map-side") {
    // the whole point of the sketch path: partitions ship mergeable
    // summaries (partial_percentile_approx), never sorted row groups
    val plan = executedPlan("q_agg_quantile_approx")
    assert(plan.contains("partial_percentile_approx"),
      s"no partial sketch aggregation:\n$plan")
    assert(!plan.contains("Window"), "sketch path must not sort per group")
  }

  test("q_sample_stratified: scan reads only the three referenced columns") {
    val plan = executedPlan("q_sample_stratified")
    assert(!plan.contains("text") && !plan.contains("n_chars"),
      s"stratified sample reads unreferenced document columns:\n$plan")
  }

  test("q_join_range: the band join is equi on (user, time bucket), not user alone") {
    // verdict-flagged 100× skew risk: with user_id as the only equi key a
    // hot user's whole history lands on one reducer and the band predicate
    // filters quadratically; the bucketed form bounds pairs per reducer
    val plan = executedPlan("q_join_range")
    val joinLine = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("user_id")).getOrElse("")
    assert(joinLine.contains("probe") && joinLine.contains("bkt_b"),
      s"time bucket missing from join keys: $joinLine")
  }

  test("FuseJaccardThreshold: similarity join conditions use the early-exit form") {
    // the condition (where most pairs fail) gets the aborting boolean
    // test; the projection (survivors only) still computes the value
    val df = SparkEntry.queries("q_sim_jaccard")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("sorted_jaccard_ge_bp"),
      s"comparison form not fused in condition:\n$optimized")
    assert(df.count() > 0)
  }

  test("q_kmeans_lloyd: the k centroid rows broadcast, never the corpus") {
    val plan = executedPlan("q_kmeans_lloyd")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"assignment crossJoin not broadcast:\n$plan")
    // the corpus side must stream: no exchange materializing embeddings
    // into a broadcast relation (mirrors the q_knn_cosine contract)
    assert(!"BroadcastExchange[^\\n]*embedding".r.findFirstIn(plan).isDefined,
      s"corpus broadcast:\n$plan")
  }

  test("q_retention: distinct user-day collapse happens below the self-join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = SparkEntry.queries("q_retention")(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"no join in plan:\n$plan")
    // both join inputs must already be aggregated (distinct) — the join
    // moves |user-days| rows, not |events|
    assert(joins.exists(j =>
      j.left.collectFirst { case a: Aggregate => a }.nonEmpty &&
        j.right.collectFirst { case a: Aggregate => a }.nonEmpty),
      s"distinct not pushed below the join:\n$plan")
    assert(df.count() > 0)
  }

  test("q_join_bloom: explicit bloom probe sits on the events side before the join") {
    val plan = executedPlan("q_join_bloom")
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // the probe must be a Filter conjunct on the fact scan (map-side,
    // pre-shuffle), not a post-join residual: in the executed plan string
    // the might_contain filter appears below the join, directly over the
    // events columns
    val probeIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe not on the scan side of the join:\n$plan")
  }

  test("runtime bloom filter: selective dim filter prunes the fact side of an SMJ") {
    // the semi-join-pushdown shape that matters at 100 TB: when the dim
    // side of a shuffle join is selectively filtered, the engine builds a
    // bloom filter from its keys at runtime and applies might_contain on
    // the fact scan, cutting shuffle input before the join. Thresholds are
    // sized for TBs; scope them down so the tiny fixture triggers the
    // same plan rewrite.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter on the fact side:\n$plan")
      assert(plan.contains("partial_bloom_filter_agg"),
        "bloom build is not map-side combined")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // AQE's toString prints final AND initial plans — shuffle counting must
  // look at the final section only or every Exchange double-counts
  private def finalPlan(name: String): String =
    executedPlan(name).split("== Initial Plan ==")(0)

  test("unhinted node-state joins broadcast via AQE at gate scale, size-gate under a shrunk threshold") {
    // round-11 verdict #2: the pagerank/ppr/assortativity/itemcf state
    // frames are NODE/ITEM-count-sized — a forced broadcast() hint would
    // OOM the build side at the 100× id domain. Unhinted, AQE's runtime
    // size check must still pick BHJ at gate scale…
    for (q <- Seq("q_graph_pagerank", "q_graph_assort", "q_rec_itemcf")) {
      val plan = finalPlan(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: AQE did not broadcast the small state side unhinted:\n$plan")
    }
    // …and under a shrunk threshold the SAME join shape must degrade to
    // SMJ instead of building an over-threshold hash side (the OOM guard
    // a forced hint bypasses). Driven on the factored helper with a
    // FRESH pair frame: the gate queries persist intermediates whose
    // cached plan strings would leak pre-conf-change BHJs into the check.
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val p = spark.range(0, 2000).toDF("da")
        .withColumn("db", pmod(col("da") * 7 + 1, lit(2000)))
        .filter(col("da") < col("db"))
      val df = graft.queries.Analytics9.assortOf(p)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastHashJoin") && plan.contains("SortMergeJoin"),
        s"with broadcasts disabled the state join must sort-merge, not force a build:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_anomaly_zscore: the 5-row stats side broadcasts, the scan side never shuffles pre-join") {
    val plan = finalPlan("q_anomaly_zscore")
    assert(plan.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$plan")
    // the only hash shuffle is the stats partial/final agg (the output
    // sort is a range exchange) — the scan side flows into the join unshuffled
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"events side shuffled before the broadcast join:\n$plan")
  }

  test("q_scd2 / q_sessionize: one user_id shuffle serves every window and the aggregate") {
    for (q <- Seq("q_scd2", "q_sessionize")) {
      val plan = finalPlan(q)
      val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
      assert(hashEx == 1, s"$q: expected exactly 1 user_id shuffle, got $hashEx:\n$plan")
    }
  }

  test("q_join_interval: grid-cell equi join, never a cartesian/nested-loop product") {
    val plan = executedPlan("q_join_interval")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a product:\n$plan")
    assert(plan.contains("bkt"), s"join keys missing the grid cell:\n$plan")
  }

  test("q_ts_ohlc: single two-phase aggregation, no window sort anywhere") {
    val plan = executedPlan("q_ts_ohlc")
    assert(plan.contains("partial_min") && plan.contains("partial_max"),
      s"OHLC argmin/argmax not map-combinable:\n$plan")
    assert(!plan.contains("Window"), s"OHLC plan fell back to a window sort:\n$plan")
    // one agg shuffle + the output range exchange, nothing else
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan("q_ts_ohlc")).size == 1,
      s"expected exactly 1 hash shuffle:\n$plan")
  }

  test("q_skyline: no quadratic self-join; windows are partitioned, never global") {
    val plan = executedPlan("q_skyline")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"skyline plan contains a join (dominance must be window-derived):\n$plan")
    // both window passes carry partition keys: no single-partition bottleneck
    assert(!plan.contains("SinglePartition"),
      s"skyline has a single-partition exchange:\n$plan")
  }

  test("q_seq_pattern: one user_id shuffle builds the sequences") {
    val plan = finalPlan("q_seq_pattern")
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected exactly 1 user_id shuffle, got $hashEx:\n$plan")
  }

  test("q_cogroup_pairs: one CoGroup over co-partitioned children, no join operator") {
    val plan = executedPlan("q_cogroup_pairs")
    assert(plan.contains("CoGroup"), s"typed cogroup not planned as CoGroup:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"cogroup plan contains a join (pairs must never materialize):\n$plan")
    // exactly one hash shuffle per side feeds the CoGroup (the output sort
    // is a range exchange)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan("q_cogroup_pairs")).size
    assert(hashEx == 2, s"expected exactly 2 co-partitioning shuffles, got $hashEx:\n$plan")
  }

  test("q_sample_weighted: one lang shuffle serves both windows") {
    val plan = finalPlan("q_sample_weighted")
    val hashEx = "Exchange hashpartitioning\\(lang".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected exactly 1 lang shuffle, got $hashEx:\n$plan")
  }

  test("q_global_rownum: numbering never plans a data-sized global window") {
    val plan = executedPlan("q_global_rownum")
    // the whole point: no row_number window anywhere — numbering is
    // mapPartitions over range-partitioned sorted data + broadcast offsets
    assert(!plan.contains("row_number"), s"fell back to a window row_number:\n$plan")
    assert(plan.contains("MapPartitions"), s"partition-local numbering missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastQueryStage"),
      s"offsets join not broadcast:\n$plan")
  }

  test("q_bucketize: assignment stage is a broadcast join — the data-sized side never sorts") {
    val plan = executedPlan("q_bucketize")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastQueryStage"),
      s"boundary frame not broadcast:\n$plan")
    // window passes exist only in the boundary derivation (rank + group
    // count, distinct frames); the assignment side joins and compares with
    // no window of its own — ntile would put one on the full data here.
    // (AQE's toString repeats the plan under "== Initial Plan ==" — count
    // the final plan only.)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Window \\[".r.findAllIn(finalPlan).size <= 2,
      s"unexpected extra window passes:\n$finalPlan")
    assert(!finalPlan.contains("ntile"), s"fell back to ntile:\n$finalPlan")
  }

  test("q_quality_audit: ONE lineitem scan serves every constraint, FK via broadcast left join") {
    val plan = executedPlan("q_quality_audit")
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin") && finalPlan.contains("LeftOuter"),
      s"FK check not a broadcast left join:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"), s"audit fell back to SMJ:\n$finalPlan")
    // the whole audit is one pass: exactly one lineitem parquet scan
    assert("Scan parquet .*lineitem|FileScan parquet.*lineitem".r
      .findAllIn(finalPlan).size == 1, s"audit scans lineitem twice:\n$finalPlan")
  }

  test("q_vocab_topk: top-k via TakeOrderedAndProject, never a vocab-sized window") {
    val plan = executedPlan("q_vocab_topk")
    assert(plan.contains("TakeOrderedAndProject(limit=200"), s"no TOAP:\n$plan")
  }

  test("q_source_gen: DSv2 scan carries pushed bounds and pruned columns") {
    val plan = executedPlan("q_source_gen")
    assert(plan.contains("bounds=[10000,49999]"), s"bounds not pushed:\n$plan")
    assert(plan.contains("cols=id,event_type,v"), s"columns not pruned:\n$plan")
    // pushed filters are exact: no post-scan Filter on id remains
    assert(!plan.contains("Filter (id#"), s"redundant re-filter:\n$plan")
  }

  test("q_join_incremental: every delta-touching join broadcasts the batch side") {
    val plan = executedPlan("q_join_incremental")
    // old⋈old may sort-merge (both sides are state-sized); the three
    // Δ-touching partials must broadcast — at scale the batch is small
    // and history is never reshuffled for it
    assert("BroadcastHashJoin".r.findAllIn(plan.split("== Initial Plan ==").head).size >= 3,
      s"delta joins not broadcast:\n$plan")
  }

  test("top-k queries: TakeOrderedAndProject + tiny-frame rank, never a data-sized global window") {
    // round-5 verdict's scale-killers: the naive row_number() OVER
    // (ORDER BY …) moves the whole frame (qualifying orders / node ids /
    // the user-id key domain) to ONE partition. The contract: sort+limit
    // fuses into TakeOrderedAndProject (per-partition top-k, driver merge)
    // and NO window operator exists anywhere in the plan — rank derives
    // from a broadcast self-join over the ≤k-row result (Q.rankTopK).
    for (name <- Seq("q_tpch_q3", "q_graph_pagerank", "q_profile_skew")) {
      val plan = finalPlan(name)
      assert(plan.contains("TakeOrderedAndProject"), s"$name: no TOAP:\n$plan")
      assert(!plan.contains("row_number"), s"$name: window row_number remains:\n$plan")
      assert(!plan.contains("Window ["), s"$name: window operator in plan:\n$plan")
    }
  }

  test("q_shard_pack / q_seq_pack: running offsets are two-phase, never a corpus-sized window") {
    // same verdict class for the running SUM: the only Window allowed in
    // the plan is the #partitions-row offset prefix (keyed by pid); the
    // corpus itself is range-partitioned, folded per-partition via
    // MapPartitions, and lifted with broadcast offsets (Q.runningSumById)
    for (name <- Seq("q_shard_pack", "q_seq_pack")) {
      val plan = finalPlan(name)
      assert(plan.contains("MapPartitions"), s"$name: partition-local fold missing:\n$plan")
      assert(plan.contains("Exchange rangepartitioning"),
        s"$name: no range partitioning on the total order:\n$plan")
      val winLines = plan.linesIterator.filter(_.contains("Window [")).toList
      assert(winLines.nonEmpty && winLines.forall(_.contains("pid")),
        s"$name: a window runs on more than the pid offset frame:\n${winLines.mkString("\n")}")
    }
  }

  test("q_tpch_q5: the dimension arm broadcasts; only the two fact joins shuffle") {
    // region→nation→supplier collapse into broadcast builds (kilobytes at
    // any scale — including the cross-dimension c_nationkey=s_nationkey
    // correlation, which rides a broadcast join's condition instead of
    // becoming a fourth shuffled join); the only data-sized exchanges are
    // lineitem⋈orders on orderkey and the custkey hop
    val plan = executedPlan("q_tpch_q5")
    assert(plan.contains("BroadcastHashJoin"), s"dim arm did not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), "correlation degenerated to a cartesian")
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 2, s"expected <=2 shuffled fact joins, got $smj:\n$plan")
  }

  test("q_tpch_q18: having-agg is two-phase; top-100 is TakeOrderedAndProject") {
    val plan = executedPlan("q_tpch_q18")
    assert(plan.contains("partial_sum"), "having aggregation is not map-combinable")
    assert(plan.contains("TakeOrderedAndProject(limit=100"),
      s"top-100 fell back to a global sort:\n$plan")
  }

  test("SUITE-WIDE: no CartesianProduct (save the declared cross join), no all-rows-to-one-partition window") {
    // The two scale-killing physical shapes nothing here should ever need:
    // a CartesianProduct (every pair-producing query buckets, broadcasts,
    // or windows instead — BroadcastNestedLoopJoin with a tiny broadcast
    // side is fine and NOT flagged), and a Window co-planned with an
    // `Exchange SinglePartition` (ALL rows moved to one task to sort —
    // the round-5 weak pattern; those five offenders now take top-k or
    // two-phase-offset plans). The window check is a string co-occurrence
    // over the AQE FINAL plan, so it over-approximates: queries where the
    // single-partition exchange is a ≤O(parallelism)-row frame unrelated
    // to (or deliberately under) the window are declared below, each
    // pinned precisely by its own contract test above. Runs every
    // registered query at sf0.001, so any future addition that regresses
    // into either shape fails here without needing its own test.
    val declaredCross = Set("q_join_cross")
    val declaredSmallFrame = Set(
      "q_ann_sq8",       // window partitioned by a_id; the exchange is the 1-row SQ8 scale agg
      "q_topk_approx",   // window over a TakeOrderedAndProject 3-row frame; exchange is the sketch merge
      "q_global_rownum", // two-phase offsets: the window reads the 32-row per-partition summary
      "q_seq_pack",      // same two-phase offset pattern (contract-tested above)
      "q_shard_pack",    // same two-phase offset pattern (contract-tested above)
      "q_tpch_q17",      // window hash-partitions by l_partkey; the exchange is the final 1-row global agg
      "q_sql_tpch_q17",  // SQL twin of q_tpch_q17: same window-by-partkey + 1-row final agg shape
      "q_sql_tpch_q3",   // rank window reads the 10-row ORDER BY+LIMIT frame (TakeOrdered upstream)
      "q_mix_budget")    // waterline windows run on the |sources|-row per-source aggregate
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      // AQE repeats the pre-adaptive plan under "== Initial Plan ==" —
      // audit only the final plan
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val cartesian = !declaredCross(name) && plan.contains("CartesianProduct")
      val globalWindow = !declaredSmallFrame(name) &&
        plan.contains("Window") && plan.contains("Exchange SinglePartition")
      (if (cartesian) Some(s"$name:cartesian") else None) ++
        (if (globalWindow) Some(s"$name:global-window") else None)
    }
    assert(offenders.isEmpty, s"scale-killing plans in: $offenders")
  }

  test("q_tpch_q4: EXISTS plans as one LEFT SEMI join — no distinct, no row explosion") {
    val plan = executedPlan("q_tpch_q4")
    assert(plan.contains("LeftSemi"), s"EXISTS did not plan a semi join:\n$plan")
    assert(!plan.contains("HashAggregate(keys=[o_orderkey"),
      "a distinct snuck in — the semi join already dedups per order")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date window not pushed to the orders scan:\n$plan")
  }

  test("q_tpch_q10: revenue aggregates below the customer join; top-20 is TakeOrderedAndProject") {
    val plan = executedPlan("q_tpch_q10")
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"top-20 fell back to a global sort:\n$plan")
    assert(plan.contains("partial_sum"), "revenue agg is not map-combinable")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1,
      s"nation dim did not broadcast:\n$plan")
  }

  test("q_rag_hybrid: both candidate generators are per-partition top-k; fusion is O(k)") {
    val plan = executedPlan("q_rag_hybrid")
    // sparse top-32 and dense top-32 each plan TakeOrderedAndProject —
    // per-partition top-k with a k·P driver merge, never a global sort
    assert("TakeOrderedAndProject\\(limit=32".r.findAllIn(plan).size >= 2,
      s"a candidate generator fell back to a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "a 1-row broadcast (corpus stats / query vector) degenerated to a cartesian")
    // the tf slice aggregates map-side before its shuffle
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"posting aggregation is not map-combinable:\n$plan")
  }

  test("q_tpch_q6: every predicate pushed, two columns read, two-phase single-row agg") {
    // toString truncates PushedFilters; the formatted mode prints it in full
    val df = SparkEntry.queries("q_tpch_q6")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), s"date window not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.04)"), "discount band not pushed")
    assert(plan.contains("LessThan(l_quantity,24.0)"), "quantity cap not pushed")
    assert(!plan.contains("l_orderkey"), "scan reads unreferenced columns")
    assert(plan.contains("partial_sum"), "revenue agg is not map-combinable")
  }

  test("q_tpch_q13: right-side filter below the join; both aggregations two-phase") {
    val plan = executedPlan("q_tpch_q13")
    // the priority exclusion must reach the orders scan, not sit above the join
    assert(plan.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"priority filter not pushed to the orders scan:\n$plan")
    assert(plan.contains("partial_count"), "per-customer count not map-combinable")
    assert(!plan.contains("CartesianProduct"), "outer join degenerated")
  }

  test("q_tpch_q19: quantity disjunction pushed to the fact scan; part side broadcasts") {
    val plan = executedPlan("q_tpch_q19")
    // Catalyst extracts the part-free disjunct (quantity bands) and pushes
    // it into the lineitem scan — the CNF-residual property the shape tests
    assert(plan.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"quantity disjunction not extracted into the fact scan:\n$plan")
    assert(plan.contains("In(p_brand"), s"brand set not pushed to the part scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "part side did not broadcast")
  }

  test("q_tpch_q21: the double correlation is one semi + one anti join on orderkey") {
    val plan = executedPlan("q_tpch_q21")
    assert(plan.contains("LeftSemi"), s"EXISTS leg did not plan a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS leg did not plan an anti join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=10"),
      s"top-10 fell back to a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), "a correlation degenerated to a product")
  }

  test("q_tpch_q22: scalar threshold broadcasts as one row; NOT EXISTS is an anti join") {
    val plan = executedPlan("q_tpch_q22")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS did not plan an anti join:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row (sum,count) threshold did not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the scalar subquery degenerated to a cartesian")
    assert(plan.contains("In(c_nationkey"), s"nation set not pushed:\n$plan")
  }

  test("q_tpch_q7: nation-pair halves pushed to both dim scans; dims broadcast") {
    val df = SparkEntry.queries("q_tpch_q7")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // Catalyst's CNF extraction sends s_nationkey∈{1,2} / c_nationkey∈{1,2}
    // below the joins — the two 25-row dim scans arrive pre-pruned
    assert(plan.contains("Or(EqualTo(s_nationkey,3),EqualTo(s_nationkey,8))") ||
      plan.contains("In(s_nationkey"),
      s"supplier nation half not pushed:\n$plan")
    assert(plan.contains("Or(EqualTo(c_nationkey,8),EqualTo(c_nationkey,3))") ||
      plan.contains("In(c_nationkey"),
      s"customer nation half not pushed:\n$plan")
    assert(!plan.contains("CartesianProduct"), "pair disjunction degenerated")
  }

  test("q_tpch_q8: the deepest star — every dimension arm broadcasts") {
    val plan = executedPlan("q_tpch_q8")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"a dimension arm fell back to a shuffle join:\n$plan")
    assert(plan.contains("partial_sum"), "share sums not map-combinable")
    assert(!plan.contains("CartesianProduct"), "star degenerated")
  }

  test("q_tpch_q15: the max-revenue threshold broadcasts as one row") {
    val plan = executedPlan("q_tpch_q15")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"1-row max frame did not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the scalar max degenerated to a cartesian")
    assert(plan.contains("partial_sum"), "per-supplier revenue not two-phase")
  }

  test("q_tpch_q20: both aggregation levels two-phase; no data-sized window") {
    val plan = executedPlan("q_tpch_q20")
    assert(plan.contains("partial_sum"), "quantity sums not map-combinable")
    assert(!plan.contains("Window"), s"a window snuck into the threshold:\n$plan")
    assert(!plan.contains("CartesianProduct"), "threshold join degenerated")
  }

  test("q_shuffle_global: the seeded shuffle is a range-partitioned sort, no single-partition stage") {
    val plan = executedPlan("q_shuffle_global")
    assert(plan.contains("Sort") && plan.contains("rangepartitioning"),
      s"shuffle is not a distributed range-partitioned sort:\n$plan")
    assert(!plan.contains("Window"), "no window belongs in a permutation sort")
  }

  test("q_mix_domains: rates broadcast; the acceptance aggregate is map-combinable") {
    val plan = executedPlan("q_mix_domains")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the 5-row rate dim did not broadcast:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"mixture audit not two-phase:\n$plan")
  }

  test("q_topk_agg: bounded-state top-k aggregates in two ObjectHashAggregate phases, no sort below the agg") {
    val plan = executedPlan("q_topk_agg")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial/final aggregate pair:\n$plan")
    assert(plan.contains("topkpairs"), s"the TopKPairs aggregate is absent:\n$plan")
    // the window form's defining cost — a per-group sort of the full row
    // set — must NOT appear anywhere below the final orderBy
    assert(!plan.contains("Window"), s"a window-rank snuck back in:\n$plan")
  }

  test("q_drift_ks: ECDFs are two-phase prefix sums, never a data-sized global window") {
    val plan = executedPlan("q_drift_ks")
    // Q.runningSumById: partition-local fold + pid-frame offsets window —
    // any window in the plan must read the per-partition summary only
    val winLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(_.contains("pid")),
      s"a window runs on more than the pid offset frame:\n${winLines.mkString("\n")}")
    assert(plan.contains("MapPartitions"), s"partition-local prefix fold missing:\n$plan")
    // the indicator-count pass over the data is map-combinable
    assert(plan.contains("partial_sum"), s"indicator agg not two-phase:\n$plan")
  }

  test("detection tier: join-free moment aggs, windows over reduced frames, TOAP tops") {
    // q_scan_hhi: two stacked two-phase aggs, no window, no join, top-20 TOAP
    val hhi = executedPlan("q_scan_hhi")
    assert(!hhi.contains("Window") && !hhi.contains("Join"), s"hhi must be agg-only:\n$hhi")
    assert(hhi.contains("partial_count") || hhi.contains("partial_sum"),
      s"hhi aggs not two-phase:\n$hhi")
    assert(hhi.contains("TakeOrderedAndProject(limit=20"), s"hhi top-20 not TOAP:\n$hhi")
    // q_conc_gini: the rank window reads the REDUCED per-(segment,host)
    // frame — the raw stream is aggregated (two-phase) before any window
    val gini = executedPlan("q_conc_gini")
    assert(gini.contains("partial_sum"), s"gini per-host agg not two-phase:\n$gini")
    val giniWin = gini.linesIterator.filter(_.contains("Window")).toSeq
    assert(giniWin.nonEmpty && giniWin.forall(l => !l.contains("value#")),
      s"gini window must rank host totals, not raw rows:\n${giniWin.mkString("\n")}")
    // q_bot_cadence / q_outage_maxgap: ONE user_id shuffle feeds both the
    // lag window and what follows (agg resp. rank window); top-20 is TOAP
    // (inspect the AQE FINAL plan only — the "Initial Plan" echo would
    // double-count every exchange)
    def finalSection(plan: String): String = plan.split("== Initial Plan ==").head
    for (q <- Seq("q_bot_cadence", "q_outage_maxgap", "q_rate_peak")) {
      val plan = finalSection(executedPlan(q))
      val shuffles = plan.linesIterator.filter(l =>
        l.contains("Exchange hashpartitioning")).toSeq
      assert(shuffles.size == 1 && shuffles.head.contains("user_id"),
        s"$q: expected exactly the user_id shuffle:\n${shuffles.mkString("\n")}\n$plan")
      assert(plan.contains("TakeOrderedAndProject(limit=20"), s"$q: top-20 not TOAP:\n$plan")
    }
    // q_change_cusum: segment totals join back as a BROADCAST; both
    // windows (running sum, argmax rank) share the one segment shuffle
    val cusum = finalSection(executedPlan("q_change_cusum"))
    assert(cusum.contains("BroadcastHashJoin"), s"cusum totals must broadcast:\n$cusum")
    assert(!cusum.contains("SortMergeJoin") && !cusum.contains("CartesianProduct"),
      s"cusum must not shuffle-join:\n$cusum")
    assert(cusum.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("event_type")) <= 2,
      s"cusum windows should share the segment shuffle:\n$cusum")
    // q_contam_semantic: the eval side broadcasts into a cell-equi hash
    // join — never an all-pairs loop or a shuffle join
    val contam = executedPlan("q_contam_semantic")
    assert(contam.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$contam")
    assert(!contam.contains("SortMergeJoin") && !contam.contains("CartesianProduct"),
      s"contam must stay cell-bounded broadcast:\n$contam")
  }

  test("§2.25 tier: chisq broadcasts cells-sized marginals; stat/sweep queries keep one shuffle") {
    def finalSection(plan: String): String = plan.split("== Initial Plan ==").head
    // q_stat_chisq: the contingency CELLS frame (|types|·7 rows) joins its
    // marginals and the 1-row grand total as BROADCASTS — a shuffle join
    // here would mean the marginals were computed data-sized
    val chisq = finalSection(executedPlan("q_stat_chisq"))
    assert(chisq.contains("BroadcastHashJoin"), s"marginals must broadcast:\n$chisq")
    assert(!chisq.contains("SortMergeJoin") && !chisq.contains("CartesianProduct"),
      s"chisq must not shuffle-join:\n$chisq")
    assert(chisq.contains("partial_count"), s"cell agg not two-phase:\n$chisq")
    // q_stat_moments / q_url_canon: join-free, window-free, one map-
    // combinable agg — the embarrassingly-parallel shape
    for (q <- Seq("q_stat_moments", "q_url_canon")) {
      val plan = finalSection(executedPlan(q))
      assert(!plan.contains("Join") && !plan.contains("Window"),
        s"$q must be agg-only:\n$plan")
      assert(plan.contains("partial_count") || plan.contains("partial_sum"),
        s"$q agg not two-phase:\n$plan")
    }
    // q_ts_autocorr / q_ts_hampel / q_ts_coverage: exactly ONE
    // hashpartitioning exchange — the user_id shuffle feeds the window
    // and everything after it (the q_bot_cadence discipline)
    for (q <- Seq("q_ts_autocorr", "q_ts_hampel", "q_ts_coverage")) {
      val plan = finalSection(executedPlan(q))
      val shuffles = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(shuffles.size == 1 && shuffles.head.contains("user_id"),
        s"$q: expected exactly the user_id shuffle:\n${shuffles.mkString("\n")}")
    }
  }

  test("§2.27 tier: profile/rank state broadcasts; audits stay agg-only") {
    def finalSection(plan: String): String = plan.split("== Initial Plan ==").head
    // q_privacy_kanon: ONE two-phase aggregation over the QI key — the
    // release audit must never join or window the corpus
    val kanon = finalSection(executedPlan("q_privacy_kanon"))
    assert(!kanon.contains("Join") && !kanon.contains("Window"),
      s"kanon must be agg-only:\n$kanon")
    assert(kanon.contains("partial_count"), s"kanon agg not two-phase:\n$kanon")
    // q_net_fanout: the |hosts|-row profile joins back as a BROADCAST —
    // a shuffle join here would re-shuffle the day cells for a frame
    // thousands of times smaller
    val fanout = finalSection(executedPlan("q_net_fanout"))
    assert(fanout.contains("BroadcastHashJoin") && !fanout.contains("SortMergeJoin"),
      s"fanout profile must broadcast:\n$fanout")
    // q_text_keywords: vocab semi-joins and both rank-state joins are
    // broadcasts (Zipf-bounded state), top-30 is TOAP — never a sort or
    // window over the word frame
    val kw = finalSection(executedPlan("q_text_keywords"))
    assert(kw.contains("BroadcastHashJoin"), s"rank state must broadcast:\n$kw")
    assert(kw.contains("TakeOrderedAndProject(limit=30"), s"top-30 not TOAP:\n$kw")
    assert(!kw.contains("CartesianProduct"), s"keywords cartesian:\n$kw")
    // q_graph_sssp: three relaxation rounds, each one edge join — no
    // cartesian, no data window; the distance frame stays node-bounded
    val sssp = finalSection(executedPlan("q_graph_sssp"))
    assert(!sssp.contains("CartesianProduct") && !sssp.contains("Window"),
      s"sssp must relax by equi join only:\n$sssp")
  }

  test("§2.28 tier: hazard/pyramid reduce first; itemcf marginals broadcast") {
    def finalSection(plan: String): String = plan.split("== Initial Plan ==").head
    // q_survival_hazard: the span reduction is the ONLY data-sized pass
    // (two-phase min/max); everything after runs on the ≤|days| lifetime
    // frame through broadcast joins — no shuffle join, no window
    val km = finalSection(executedPlan("q_survival_hazard"))
    assert(km.contains("partial_min") && km.contains("partial_max"),
      s"span reduction not two-phase:\n$km")
    assert(!km.contains("SortMergeJoin") && !km.contains("Window"),
      s"hazard must stay on the reduced frame:\n$km")
    // q_tile_pyramid: join-free log-depth rollup — each zoom aggregates
    // the PREVIOUS level's cells (z6 persists; z4/z2 read the cache)
    val py = finalSection(executedPlan("q_tile_pyramid"))
    assert(!py.contains("Join") && !py.contains("Window"),
      s"pyramid must be agg-only:\n$py")
    assert(py.contains("InMemoryTableScan"),
      s"coarser zooms must read the cached finer level, not the raw scan:\n$py")
    // q_rec_itemcf: the basket self-join is the data-sized stage; both
    // marginal joins ride broadcasts and the shortlist window hash-
    // partitions by the item key
    val cf = finalSection(executedPlan("q_rec_itemcf"))
    assert("BroadcastHashJoin".r.findAllIn(cf).size >= 2,
      s"itemcf marginals must broadcast:\n$cf")
    assert(!cf.contains("Exchange SinglePartition") || !cf.contains("Window"),
      s"shortlist window single-partitioned:\n$cf")
    // q_ab_cuped: two two-phase aggs over the user frame; moment rows
    // join back as broadcasts only
    val cu = finalSection(executedPlan("q_ab_cuped"))
    assert(!cu.contains("SortMergeJoin"), s"cuped moments must broadcast:\n$cu")
    assert(cu.contains("partial_sum"), s"cuped aggs not two-phase:\n$cu")
  }

  test("§2.30 plan contracts: one-pass DQ rules; classifier model broadcasts") {
    def finalSection(plan: String): String = plan.split("== Initial Plan ==").head
    // q_dq_rules: N rules = ONE scan + ONE two-phase aggregate — a rule
    // suite that re-scans per rule is unrunnable at 100 TB. The unpivot
    // runs on the 1-row aggregate, so exactly one parquet scan appears.
    val dq = finalSection(executedPlan("q_dq_rules"))
    assert("Scan parquet".r.findAllIn(dq).size == 1,
      s"DQ rules must scan once, not per rule:\n$dq")
    assert(dq.contains("partial_count") || dq.contains("partial_sum"),
      s"DQ aggregate not two-phase:\n$dq")
    assert(!dq.contains("Join"), s"DQ suite must not join:\n$dq")
    // q_quality_classifier: the 50-row model joins the corpus words as a
    // BROADCAST (the model is KBs at any corpus size); the corpus side
    // never shuffles wider than (doc_id, score)
    val qc = finalSection(executedPlan("q_quality_classifier"))
    assert(qc.contains("BroadcastHashJoin"), s"model must broadcast:\n$qc")
    assert(!qc.contains("SortMergeJoin"), s"classifier must not shuffle-join:\n$qc")
  }
}
