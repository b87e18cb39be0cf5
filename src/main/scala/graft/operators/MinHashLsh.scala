package graft.operators

import graft.functions.MinHashSig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash-LSH near-duplicate detection — the linear-cost scale path of
  * the dedup family (exact tier: [[SetSimilarity]]): 32 per-word xxhash64
  * min-signatures → 8 bands of 4 → band-hash bucket join for candidates →
  * signature prefilter → exact sorted-hash-set Jaccard confirm.
  *
  * Cost is ~linear in documents when the ≥threshold pair set is sparse
  * (the real-corpus case): every stage is an equi join or hash aggregate
  * on long keys, and the only pair-shaped work is per LSH bucket.
  * SparseLshSpec demonstrates this on a generated 20k-doc sparse corpus —
  * candidate count equals the planted near-dup count, with zero quadratic
  * leakage. On the driver's pathologically dense synthetic corpus the
  * OUTPUT itself is quadratic (42% of all pairs ≥0.7-similar), which no
  * banding scheme can prune — hence q_dedup_minhash's documented doc_id
  * bound there.
  */
object MinHashLsh {

  /** 32-minhash signature per document over its distinct whitespace words
    * — one pass via the typed [[MinHashSig]] Aggregator (map-side
    * combinable, hashes each token's bytes ONCE for all 32 permutations;
    * byte-equal to the 32-MIN `xxhash64(word, lit(s))` expression form,
    * pinned by HashCompatSpec). */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
      .groupBy(col("doc_id"))
      .agg(MinHashSig.minhash32(col("word")).as("sig"))

  /** Banded candidate pairs (da < db), deduped. 8 bands × 4 rows: a pair
    * with signature agreement s collides in some band with probability
    * 1−(1−s⁴)⁸ (≈0.97 at s=0.8, ≈0.03 at s=0.3) — the LSH S-curve that
    * makes the bucket join linear on sparse corpora.
    *
    * distinct runs FIRST on the two long keys (codegen'd hash agg);
    * carrying the 32-element sig arrays through distinct regressed
    * 42s → 280s in round 1 (interpreted array-key aggregation over the
    * 8× band duplicates). */
  def candidateKeys(sigs: DataFrame): DataFrame = {
    val bands = sigs
      .withColumn("band", explode(typedLit((0 until 8).toArray)))
      .select(col("doc_id"), col("band"),
        xxhash64(expr("slice(sig, band * 4 + 1, 4)"), col("band")).as("band_sig"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
  }

  /** Full pipeline over (doc_id: long, text: string): near-dup pairs with
    * exact word-set Jaccard ≥ minBp basis points, as (da, db, jacc_bp).
    *
    * The signature-estimate prefilter (agreement ≥ 32·t − 8, i.e. 14/32 at
    * t = 0.7) keeps P(drop a true ≥t pair) ≈ P(Binom(32, t) < k) ~ 1e-3
    * while rejecting the low-jaccard bulk before the exact join. The sig
    * attach is a plain equi join on doc_id: sigs is O(corpus), so an
    * explicit broadcast hint would cap the operator at executor memory
    * (~1e8 docs × 256 B); locally AQE may still elect a broadcast from the
    * observed size — the right call at either scale, made from data. The
    * confirm stage is the same codegen'd sorted-hash merge pass as the
    * exact tier (`sorted_jaccard_bp`, identical up to 64-bit hash
    * collisions), so LSH and exact answers agree wherever both run. */
  def nearDupPairs(docs: DataFrame, minBp: Long): DataFrame = {
    // persist: sigs feeds the band build AND both candidate sig-attach
    // joins — without it the explode+agg pipeline re-runs per consumer
    val sigs = signatures(docs).persist()
    val prefilter = math.max(0L, (32L * minBp) / 10000L - 8L)
    val cands = candidateKeys(sigs)
      .join(sigs.select(col("doc_id"), col("sig").as("siga")), col("da") === col("doc_id"))
      .drop("doc_id")
      .join(sigs.select(col("doc_id"), col("sig").as("sigb")), col("db") === col("doc_id"))
      .filter(expr(s"size(filter(zip_with(siga, sigb, (x, y) -> x = y), b -> b)) >= $prefilter"))
      .select(col("da"), col("db"))
    // exact confirm via the sorted-hash-set merge pass (two equi joins +
    // one codegen'd pass per candidate; no corpus re-tokenization).
    // persist: both attach joins consume sets but prune different aliases,
    // so without the cache the HOF tokenize+sort pipeline runs twice
    val sets = docs.select(col("doc_id"),
      expr("array_sort(transform(array_distinct(split(text, ' ')), w -> xxhash64(w)))").as("ws"))
      .persist()
    cands
      .join(sets.select(col("doc_id"), col("ws").as("wsa")), col("da") === col("doc_id"))
      .drop("doc_id")
      .join(sets.select(col("doc_id"), col("ws").as("wsb")), col("db") === col("doc_id"))
      .drop("doc_id")
      .select(col("da"), col("db"), expr("sorted_jaccard_bp(wsa, wsb)").as("jacc_bp"))
      .filter(col("jacc_bp") >= minBp)
  }
}
