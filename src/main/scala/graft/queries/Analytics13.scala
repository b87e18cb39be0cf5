package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 continuation additions (SURVEY §2.30): the diameter-proof CC
  * alternative, linear-model quality-classifier inference, epoch-based
  * corpus upsampling, and keep-best dedup — each an LLM-pipeline shape
  * the existing tiers compose around, each DuckDB-oracle-checked. */
object Analytics13 {

  /** DEDUP CLUSTERING VIA STAR CONTRACTION — the same near-dup graph as
    * [[LlmExt.q_dedup_cluster]] (exact ≥0.8-Jaccard pairs on the dense
    * slice) clustered by Kiveris et al.'s alternating large-star /
    * small-star contraction instead of min-label flooding
    * ([[graft.operators.StarContraction]]). Earns the IDENTICAL oracle:
    * both algorithms must land on the same canonical labeling, so the
    * gate pins algorithm-independence of the clustering contract — and
    * the engine ships the O(log² n)-round variant a long-chain graph
    * (citation trails, temporal follows) needs where min-flooding's
    * O(diameter) rounds degenerate. StarContractionSpec pins equality
    * with minLabel on randomized graphs including paths. */
  def q_dedup_cluster_star(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 1000)
    val sets = docs.select(col("doc_id"),
      expr("array_sort(transform(array_distinct(split(text, ' ')), w -> xxhash64(w)))").as("ws"))
    val pairs = graft.operators.SetSimilarity.exactJaccardPairs(sets, minBp = 8000L)
      .select(col("da"), col("db"))
    graft.operators.StarContraction
      .components(docs.select(col("doc_id")), "doc_id", pairs, "da", "db")
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** QUALITY-CLASSIFIER INFERENCE — the fasttext-style linear scorer
    * every corpus pipeline runs at ingest, as pure plan: the MODEL is a
    * 50-row broadcast table (here derived deterministically from the
    * corpus itself — the top-50 words by document frequency, weight
    * 51 − 2·rank, so rank 1 scores +49 and rank 50 scores −49), and
    * INFERENCE is one distinct-word explode, one broadcast join against
    * the model (out-of-vocabulary words score 0 by dropping out), one
    * per-doc integer sum, one threshold. At 100 TB the model is KBs
    * broadcast everywhere and the corpus-sized side never shuffles wider
    * than (doc_id, score) — the exact shape a real (externally-trained)
    * weight table plugs into. All-integer scores; the oracle recomputes
    * the same ranks and weights. */
  def q_quality_classifier(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
    // top-50 by df via TakeOrderedAndProject + the k²-broadcast rank
    // (Q.rankTopK) — never a single-partition window over the vocabulary
    val top = words.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w").asc).limit(50).persist()
    val model = Q.rankTopK(top, "df", "w")
      .select(col("w"), (lit(51L) - lit(2L) * col("rk")).as("weight"))
    val scored = words
      .join(broadcast(model), Seq("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("weight")).as("score"))
    scored
      .groupBy(col("lang"), (col("score") >= 0).as("passed"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("score_sum"),
        min(col("score")).as("score_min"), max(col("score")).as("score_max"))
      .orderBy(col("lang"), col("passed"))
  }

  /** EPOCH-BASED UPSAMPLING MIX — the corpus-mixing step that REPEATS
    * high-value domains (q_mix_domains subsamples down; real training
    * mixes also weight UP: "2.3 epochs of wikipedia"): per source, an
    * integer epoch count 1 + (len(source) mod 2) plus a deterministic
    * fractional epoch (doc_id mod 4 = 0 → one extra copy ≈ 0.25), each
    * copy tagged with its epoch index. One narrow
    * explode(sequence(1, repeats)) — zero shuffles until the audit
    * aggregate — and the checksum Σ(doc_id · copy) pins that copies are
    * real tagged rows, not a multiplied count. At 100 TB the expansion
    * is map-side and the copy tag is what keeps downstream shuffles
    * (pack, split) from collapsing duplicates. */
  def q_mix_upsample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (lit(1L) + length(col("source")) % 2 +
          when(col("doc_id") % 4 === 0, 1L).otherwise(0L)).as("repeats"))
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(1, repeats)")).as("copy"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows_epoch"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("doc_id") * col("copy")).as("checksum"))
      .orderBy(col("source"))

  /** KEEP-BEST DEDUP — the group-level survivor pick that follows any
    * dedup clustering (URL dedup keeps the freshest crawl, source dedup
    * the longest doc): per (lang, source) group, the single best doc by
    * (n_chars DESC, doc_id ASC — the full deterministic tie-break).
    * One row_number window PARTITIONED BY THE GROUP KEY (group-bounded,
    * never data-sized-single-partition); survivors aggregate per lang.
    * The rank-1 argmax via window is the scalable shape: a
    * groupBy(max(struct)) carries the whole row through the aggregation
    * buffer, the window carries only the sort key. */
  def q_dedup_keepbest(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rk") === 1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cluster_star" -> q_dedup_cluster_star _,
    "q_quality_classifier" -> q_quality_classifier _,
    "q_mix_upsample" -> q_mix_upsample _,
    "q_dedup_keepbest" -> q_dedup_keepbest _,
  )

  val oracle: Map[String, String] = Map(
    // identical to q_dedup_cluster's oracle: the clustering contract is
    // algorithm-independent (min-label and star contraction must agree)
    "q_dedup_cluster_star" -> // verbatim q_dedup_cluster oracle: the
      // clustering contract is algorithm-independent
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 1000),
        |w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM d),
        |sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |          FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT da, db FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
        |  WHERE floor(10000.0 * i / (sa.n + sb.n - i)) >= 8000),
        |edges AS (SELECT da AS a, db AS b FROM pairs UNION ALL SELECT db, da FROM pairs),
        |reach AS (
        |  WITH RECURSIVE rr(a, b) AS (
        |    SELECT doc_id, doc_id FROM d
        |    UNION
        |    SELECT rr.a, e.b FROM rr JOIN edges e ON rr.b = e.a)
        |  SELECT * FROM rr)
        |SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
    "q_quality_classifier" ->
      """WITH words AS (
        |  SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |model AS (
        |  SELECT w, 51 - 2 * row_number() OVER (ORDER BY count(*) DESC, w ASC) AS weight
        |  FROM words GROUP BY w
        |  ORDER BY count(*) DESC, w ASC LIMIT 50),
        |scored AS (
        |  SELECT doc_id, lang, CAST(sum(weight) AS BIGINT) AS score
        |  FROM words JOIN model USING (w)
        |  GROUP BY doc_id, lang)
        |SELECT lang, score >= 0 AS passed, count(*) AS n_docs,
        |  CAST(sum(score) AS BIGINT) AS score_sum, min(score) AS score_min,
        |  max(score) AS score_max
        |FROM scored GROUP BY lang, passed ORDER BY lang, passed""".stripMargin,
    "q_mix_upsample" ->
      """WITH expanded AS (
        |  SELECT doc_id, source, unnest(generate_series(1,
        |    1 + length(source) % 2 + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)) AS copy
        |  FROM documents)
        |SELECT source, count(*) AS n_rows_epoch,
        |  count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(doc_id * copy) AS BIGINT) AS checksum
        |FROM expanded GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_keepbest" ->
      """WITH ranked AS (
        |  SELECT lang, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY lang, source
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM ranked WHERE rk = 1
        |GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
