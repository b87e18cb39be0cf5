package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs Jaccard over per-document token sets, at the best
  * complexity an EXACT answer admits on a dense corpus.
  *
  * The naive inverted-index formulation (self-join token lists on the
  * token) explodes on hot tokens: a token present in d documents
  * contributes d²/2 join rows, so ubiquitous tokens make the join
  * quadratic in the corpus regardless of scale factor. The standard
  * document-frequency prefilter is no help on this corpus — measured: the
  * 30 common words each sit in 76-80% of documents at BOTH sf0.01 and
  * sf0.1, so any df cap that shrinks the join also empties the
  * intersection (there is no Zipf tail to keep).
  *
  * This operator instead:
  *  1. builds each document's token set map-side (no explode, no shuffle):
  *     dictionary-hash every token with xxhash64 and sort — set identity
  *     and intersections are preserved up to 64-bit hash collisions
  *     (P ≈ vocab²/2⁶⁴, negligible);
  *  2. collapses exact-duplicate sets (groupBy the set itself — duplicate
  *     and boilerplate documents are the common case in web corpora), so
  *     the pair loop runs over M distinct sets, never over hot tokens;
  *  3. joins distinct-set pairs under the size-ratio bound of
  *     Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search"
  *     (WWW 2007): jaccard ≥ t forces t·|b| ≤ |a| ≤ |b|/t, pruning before
  *     any intersection is computed; survivors pay one allocation-free
  *     codegen'd merge pass ([[graft.functions.SortedJaccardBp]]);
  *  4. expands qualifying set pairs back to document pairs (within-set
  *     pairs are exact duplicates: jaccard = 1 by construction).
  *
  * The pair join is quadratic in M by nature — EXACT all-pairs similarity
  * is contract-bounded to ≤5k documents (SURVEY §2.9); the unbounded scale
  * path is MinHash-LSH banding (q_dedup_minhash), for which this operator
  * is the correctness twin.
  */
object SetSimilarity {

  /** All document pairs (da < db) with exact set-Jaccard ≥ minBp basis
    * points.
    *
    * @param sets  (doc_id: long, ws: array<bigint>) — ws ascending-sorted
    *              distinct token hashes, e.g.
    *              `array_sort(transform(array_distinct(tokens), t -> xxhash64(t)))`
    * @return (da, db, jacc_bp) with jacc_bp = floor(10000·|∩|/|∪|)
    */
  def exactJaccardPairs(sets: DataFrame, minBp: Long): DataFrame = {
    // collapse exact-duplicate sets; sk = 64-bit surrogate of the set
    // (long join keys keep every downstream exchange codegen-friendly —
    // array-keyed shuffles measured 6.7x slower in round 1)
    //
    // The explicit repartition is load-bearing: distinct sets are only a
    // few MB, so AQE coalesces the post-aggregate shuffle to ONE partition
    // — and the O(M²) pair join below inherits it, running single-threaded
    // (measured 117s vs 6s at sf0.1: AQE plans by byte size and is blind
    // to downstream COMPUTE cost). An explicit numbered repartition is
    // exempt from AQE coalescing, keeping the quadratic loop spread over
    // every core; the extra exchange moves only M tiny rows.
    // persist: three consumers (pair-join left, pair-join right via
    // broadcast, within-set expansion) prune different columns, so the
    // subplans canonicalize unequal and ReuseExchange never fires —
    // without the cache the whole tokenize+collapse pipeline runs 3×
    // (verified: 3 parquet scans in the executed plan)
    val distinctSets = sets
      .groupBy(col("ws")).agg(collect_list(col("doc_id")).as("members"))
      .select(xxhash64(col("ws")).as("sk"), col("ws"), size(col("ws")).as("n"), col("members"))
      .repartition(sets.sparkSession.sessionState.conf.numShufflePartitions)
      .persist()
    // members ride through the pair join instead of being re-joined after
    // it: every distinctSets consumer prunes a different column set, which
    // defeats ReuseExchange (canonically-unequal subplans) and re-runs the
    // whole token pipeline per branch — carrying members keeps it to two
    // branches (pair join sides) plus the within-set one
    val left = distinctSets.select(col("sk").as("ka"), col("ws").as("wa"),
      col("n").as("na"), col("members").as("ma"))
    val right = distinctSets.select(col("sk").as("kb"), col("ws").as("wb"),
      col("n").as("nb"), col("members").as("mb"))
    // sorted_jaccard_bp fuses merge-pass intersection + quantization so the
    // filter costs ONE pass per pair even once Catalyst pushes it into the
    // join condition (join conditions get no CSE; the unfused form paid 2×).
    // The Bayardo size-ratio prune is NOT written here: the
    // graft.plans.InferJaccardSizeBound optimizer rule derives it from the
    // jacc_bp threshold and prepends it to the condition, short-circuiting
    // the merge pass on size-incompatible pairs (PlanQualitySpec asserts
    // the injected bound).
    val qual = left.join(right, col("ka") < col("kb"))
      .withColumn("jacc_bp", expr("sorted_jaccard_bp(wa, wb)"))
      .filter(col("jacc_bp") >= minBp)
    // cross-set expansion: every member pair across the two sets
    val cross = qual
      .select(explode(col("ma")).as("x"), col("mb"), col("jacc_bp"))
      .select(col("x"), explode(col("mb")).as("y"), col("jacc_bp"))
      .select(least(col("x"), col("y")).as("da"), greatest(col("x"), col("y")).as("db"),
        col("jacc_bp"))
    // within-set expansion: identical sets are jaccard 1 by construction
    val same = distinctSets.filter(size(col("members")) >= 2)
      .select(explode(col("members")).as("x"), col("members"))
      .select(col("x"), explode(col("members")).as("y"))
      .filter(col("x") < col("y"))
      .select(col("x").as("da"), col("y").as("db"), lit(10000L).as("jacc_bp"))
    cross.unionByName(same)
  }
}
