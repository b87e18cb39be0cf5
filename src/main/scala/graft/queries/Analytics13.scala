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
    // shared pair graph — see [[DedupGraph]]: built once per (JVM,
    // corpus) by whichever CC gate runs first
    val pairs = DedupGraph.pairs(spark, dir)
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
    // top-50 by df via TakeOrderedAndProject, then COLLECTED to a local
    // relation: the model is 50 rows — an O(k) driver materialization
    // (the k=12 BPE-argmax precedent), so rankTopK's two scans and the
    // inference join read a LocalTableScan, not a re-run of the
    // vocabulary aggregate, and nothing stays persisted after the query
    // (the round-9 ADVICE leak was exactly this frame's persist())
    val topRows = words.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w").asc).limit(50)
    val top = spark.createDataFrame(
      java.util.Arrays.asList(topRows.collect(): _*), topRows.schema)
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

  /** MANN-WHITNEY U — the NONPARAMETRIC two-sample test beside
    * q_ab_welch's t (rank-based: robust to the heavy-tailed metrics
    * A/B values actually have). Within each event_type, variant = user
    * parity; ALL rank arithmetic runs on the value-cents HISTOGRAM
    * (per-(type, cents) counts — the §2.26 domain-bounded recipe: the
    * running-count window is histogram-sized, never data-sized), with
    * tie-averaged ranks kept EXACT as doubled integers: avg2(v) =
    * 2·(#strictly below) + tie + 1, R2ₐ = Σ nₐ(v)·avg2(v),
    * U2ₐ = R2ₐ − nₐ(nₐ+1), and U2ₐ + U2ᵦ = 2nₐnᵦ by construction —
    * all BIGINT, no division anywhere. */
  def q_ab_mannwhitney(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir).select(
      col("event_type").as("t"),
      (col("user_id") % 2 === 0).cast("long").as("is_a"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
    val hist = d.groupBy(col("t"), col("c"))
      .agg(count(lit(1)).as("n"), sum(col("is_a")).as("na"))
    val w = Window.partitionBy(col("t")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("cumIncl", sum(col("n")).over(w))
      .withColumn("avg2", lit(2L) * (col("cumIncl") - col("n")) + col("n") + 1L)
    ranked.groupBy(col("t"))
      .agg(sum(col("na")).as("n_a"), sum(col("n") - col("na")).as("n_b"),
        sum(col("na") * col("avg2")).as("r2_a"))
      .select(col("t").as("event_type"), col("n_a"), col("n_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1L)).as("u2_a"),
        (lit(2L) * col("n_a") * col("n_b") -
          (col("r2_a") - col("n_a") * (col("n_a") + 1L))).as("u2_b"))
      .orderBy(col("event_type"))
  }

  /** CLASSIFIER EVALUATION — the confusion matrix + exact-bp
    * precision/recall readout every model-in-the-pipeline needs
    * (here evaluating q_text_lang_id's stopword heuristic against the
    * labeled lang column): per (truth, predicted) cell the count, the
    * cell's recall share of its truth row and precision share of its
    * prediction column, both as integer-div basis points over exact
    * counts. Marginals are label-domain-sized broadcasts. */
  def q_eval_confusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("size(filter(split(text, ' '), w -> w IN ('the','and','of','a','to')))").as("n_en"),
        expr("size(filter(split(text, ' '), w -> w IN ('der','die','und','das')))").as("n_de"),
        expr("size(filter(split(text, ' '), w -> w IN ('el','la','los','y')))").as("n_es"),
        expr("size(filter(split(text, ' '), w -> w IN ('le','les','et','un')))").as("n_fr"))
      .withColumn("pred_lang",
        when(col("n_en") >= col("n_de") && col("n_en") >= col("n_es") && col("n_en") >= col("n_fr") && col("n_en") > 0, "en")
          .when(col("n_de") >= col("n_es") && col("n_de") >= col("n_fr") && col("n_de") > 0, "de")
          .when(col("n_es") >= col("n_fr") && col("n_es") > 0, "es")
          .when(col("n_fr") > 0, "fr")
          .otherwise("unknown"))
      .select(col("lang"), col("pred_lang"))
    val conf = pred.groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
    val truthN = conf.groupBy(col("lang")).agg(sum(col("n")).as("n_truth"))
    val predN = conf.groupBy(col("pred_lang")).agg(sum(col("n")).as("n_pred"))
    conf.join(broadcast(truthN), Seq("lang"))
      .join(broadcast(predN), Seq("pred_lang"))
      .select(col("lang"), col("pred_lang"), col("n"), col("n_truth"), col("n_pred"),
        expr("(10000 * n) div n_truth").as("recall_bp"),
        expr("(10000 * n) div n_pred").as("precision_bp"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** ORPHAN-FILE GC through the gate: a planted unreferenced data file
    * (the dropping of a crashed writer — staged bytes, no manifest) is
    * detected from O(files) metadata and reclaimed past the grace
    * window, while every referenced file and the young in-flight one
    * survive; the read-back must be the COMPLETE untouched content.
    * At 100 TB orphan GC is what keeps storage bills honest — crashed
    * ingest writers strand terabytes invisible to every reader. */
  def q_table_gc(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    Tables.ensure(spark)
    val published = TableOps.eventsTableRoot(spark, dir)
    TableOps.mutatedAggregate(spark, published, "graft_q_table_gc") { root =>
      val t = new graft.tables.TxTable(root, Seq("user_id"))
      val dataDir = JPaths.get(root, "data")
      val some = JFiles.list(dataDir).iterator().next()
      // an OLD orphan (crashed writer, long gone) and a YOUNG one (maybe
      // a live writer about to commit): only the old one may be reclaimed
      val old = dataDir.resolve("orphan-old.parquet")
      val young = dataDir.resolve("orphan-young.parquet")
      JFiles.copy(some, old); JFiles.copy(some, young)
      JFiles.setLastModifiedTime(old,
        java.nio.file.attribute.FileTime.fromMillis(0L))
      val removed = t.gcOrphans(graceMs = 3600L * 1000L)
      val remaining = t.orphanFiles().size
      t.read(spark)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("v_sum"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("orphans_removed", lit(removed.toLong))
        .withColumn("orphans_left", lit(remaining.toLong))
        .orderBy(col("event_type"))
    }
  }

  /** DECLARATIVE DATA-QUALITY RULES (the deequ shape): N named boolean
    * rules — range checks, JSON-field band, non-negativity — evaluated
    * in ONE pass over the data (each rule is a codegen'd when/sum pair
    * inside the same aggregate; N rules never cost N scans), then
    * unpivoted to one audit row per rule: rows seen, violations,
    * violation rate in integer-div bp, and the smallest offending
    * event_id as the deterministic sample a ticket links to. At 100 TB
    * the single-pass property is the whole game — a rule suite that
    * re-scans per rule is unrunnable. */
  def q_dq_rules(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      col("value"), expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
    val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "props_k_band" -> !(col("k").isNotNull && col("k") >= 10 && col("k") <= 80),
      "user_id_lt_100" -> !(col("user_id") < 100),
      "value_le_400" -> !(col("value") <= 400.0),
      "value_nonneg" -> !(col("value") >= 0.0))
    val aggs = rules.flatMap { case (name, violated) =>
      Seq(sum(violated.cast("long")).as(s"__v_$name"),
        min(when(violated, col("event_id"))).as(s"__id_$name"))
    }
    val one = e.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col("__rows").as("n_rows"),
        col(s"__v_$name").as("n_violations"),
        col(s"__id_$name").as("first_bad_id"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .select(col("rule"), col("n_rows"), col("n_violations"),
        expr("(10000 * n_violations) div n_rows").as("violation_bp"),
        col("first_bad_id"))
      .orderBy(col("rule"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cluster_star" -> q_dedup_cluster_star _,
    "q_quality_classifier" -> q_quality_classifier _,
    "q_mix_upsample" -> q_mix_upsample _,
    "q_dedup_keepbest" -> q_dedup_keepbest _,
    "q_ab_mannwhitney" -> q_ab_mannwhitney _,
    "q_dq_rules" -> q_dq_rules _,
    "q_eval_confusion" -> q_eval_confusion _,
    "q_table_gc" -> q_table_gc _,
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
    "q_ab_mannwhitney" ->
      """WITH d AS (
        |  SELECT event_type AS t,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
        |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |hist AS (
        |  SELECT t, c, count(*) AS n, CAST(sum(is_a) AS BIGINT) AS na
        |  FROM d GROUP BY t, c),
        |ranked AS (
        |  SELECT t, n, na,
        |    2 * (sum(n) OVER (PARTITION BY t ORDER BY c
        |                      ROWS UNBOUNDED PRECEDING) - n) + n + 1 AS avg2
        |  FROM hist),
        |agg AS (
        |  SELECT t, CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(n - na) AS BIGINT) AS n_b,
        |    CAST(sum(na * avg2) AS BIGINT) AS r2_a
        |  FROM ranked GROUP BY t)
        |SELECT t AS event_type, n_a, n_b,
        |  r2_a - n_a * (n_a + 1) AS u2_a,
        |  2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_dq_rules" ->
      """WITH e AS (
        |  SELECT event_id, user_id, "value",
        |    CAST(json_extract_string(props::JSON, '$.k') AS BIGINT) AS k
        |  FROM events),
        |agg AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN NOT (k IS NOT NULL AND k BETWEEN 10 AND 80) THEN 1 ELSE 0 END) AS BIGINT) AS v_k,
        |    min(CASE WHEN NOT (k IS NOT NULL AND k BETWEEN 10 AND 80) THEN event_id END) AS id_k,
        |    CAST(sum(CASE WHEN NOT (user_id < 100) THEN 1 ELSE 0 END) AS BIGINT) AS v_u,
        |    min(CASE WHEN NOT (user_id < 100) THEN event_id END) AS id_u,
        |    CAST(sum(CASE WHEN NOT ("value" <= 400) THEN 1 ELSE 0 END) AS BIGINT) AS v_hi,
        |    min(CASE WHEN NOT ("value" <= 400) THEN event_id END) AS id_hi,
        |    CAST(sum(CASE WHEN NOT ("value" >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_neg,
        |    min(CASE WHEN NOT ("value" >= 0) THEN event_id END) AS id_neg
        |  FROM e)
        |SELECT r.rule, agg.n_rows,
        |  CASE r.rule WHEN 'props_k_band' THEN v_k WHEN 'user_id_lt_100' THEN v_u
        |              WHEN 'value_le_400' THEN v_hi ELSE v_neg END AS n_violations,
        |  (10000 * CASE r.rule WHEN 'props_k_band' THEN v_k WHEN 'user_id_lt_100' THEN v_u
        |              WHEN 'value_le_400' THEN v_hi ELSE v_neg END) // agg.n_rows AS violation_bp,
        |  CASE r.rule WHEN 'props_k_band' THEN id_k WHEN 'user_id_lt_100' THEN id_u
        |              WHEN 'value_le_400' THEN id_hi ELSE id_neg END AS first_bad_id
        |FROM agg CROSS JOIN (VALUES ('props_k_band'), ('user_id_lt_100'),
        |  ('value_le_400'), ('value_nonneg')) AS r(rule)
        |ORDER BY r.rule""".stripMargin,
    "q_eval_confusion" ->
      """WITH pred AS (
        |  SELECT lang,
        |    CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr AND n_en > 0 THEN 'en'
        |         WHEN n_de >= n_es AND n_de >= n_fr AND n_de > 0 THEN 'de'
        |         WHEN n_es >= n_fr AND n_es > 0 THEN 'es'
        |         WHEN n_fr > 0 THEN 'fr'
        |         ELSE 'unknown' END AS pred_lang
        |  FROM (SELECT lang,
        |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','and','of','a','to'))) AS INT) AS n_en,
        |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) AS INT) AS n_de,
        |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ('el','la','los','y'))) AS INT) AS n_es,
        |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ('le','les','et','un'))) AS INT) AS n_fr
        |    FROM documents)),
        |conf AS (SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY lang, pred_lang),
        |tn AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_truth FROM conf GROUP BY lang),
        |pn AS (SELECT pred_lang, CAST(sum(n) AS BIGINT) AS n_pred FROM conf GROUP BY pred_lang)
        |SELECT lang, pred_lang, n, n_truth, n_pred,
        |  (10000 * n) // n_truth AS recall_bp,
        |  (10000 * n) // n_pred AS precision_bp
        |FROM conf JOIN tn USING (lang) JOIN pn USING (pred_lang)
        |ORDER BY lang, pred_lang""".stripMargin,
    "q_table_gc" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v_sum,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(1 AS BIGINT) AS orphans_removed,
        |  CAST(1 AS BIGINT) AS orphans_left
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
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
