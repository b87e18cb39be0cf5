package graft

import graft.queries.Analytics13
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.30 additions (the
  * round-9 verdict's spec-discipline item: oracle-green-by-construction
  * is not enough — each query's arithmetic is re-derived here in plain
  * Scala from collected rows, plus hand-derived fixtures for the tie
  * and OOV edges the corpus may not exercise). */
class Analytics13Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("q_quality_classifier equals a plain-Scala rank/weight/score fold") {
    val wordRows = docs.flatMap { case (id, lang, _, text, _) =>
      text.split(" ").distinct.map(w => (id, lang, w)) }
    val df = wordRows.groupBy(_._3).map { case (w, rs) => (w, rs.size.toLong) }
    val top = df.toSeq.sortBy { case (w, n) => (-n, w) }.take(50)
    val weight = top.zipWithIndex.map { case ((w, _), i) => w -> (51L - 2L * (i + 1)) }.toMap
    val scored = wordRows.groupBy(r => (r._1, r._2)).toSeq.map { case ((_, lang), rs) =>
      (lang, rs.map(r => weight.getOrElse(r._3, 0L)).sum) }
    val want = scored.groupBy { case (lang, s) => (lang, s >= 0) }.toSeq
      .map { case ((lang, passed), rs) =>
        (lang, passed, rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).min, rs.map(_._2).max) }
      .sortBy { case (lang, passed, _, _, _, _) => (lang, passed) }
    val got = Analytics13.q_quality_classifier(spark, sf).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got == want)
    // at sf0.001 the corpus vocabulary (31 words) fits inside the top-50
    // model, so the equality above cannot exercise OOV; the constructed
    // fixture below does
    assert(weight.size == df.size && df.size <= 50)
  }

  test("classifier OOV words contribute exactly zero (constructed fixture)") {
    // model knows {good: +5, bad: -3}; doc 1 mixes them with OOV noise,
    // doc 2 is ALL OOV — inference is an inner broadcast join, so doc 2
    // drops out entirely (score undefined, not zero rows of noise)
    val model = Seq(("good", 5L), ("bad", -3L)).toDF("w", "weight")
    val docsDf = Seq((1L, "good zzz bad qqq good"), (2L, "qqq zzz")).toDF("doc_id", "text")
    val scored = docsDf
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .join(broadcast(model), Seq("w"))
      .groupBy(col("doc_id")).agg(sum(col("weight")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // distinct-word scoring: good counted once despite appearing twice
    assert(scored == Map(1L -> 2L))
  }

  test("q_mix_upsample equals a plain-Scala epoch expansion; checksum pins copy tags") {
    val expanded = docs.flatMap { case (id, _, src, _, _) =>
      val repeats = 1L + src.length % 2 + (if (id % 4 == 0) 1L else 0L)
      (1L to repeats).map(c => (src, id, c)) }
    val want = expanded.groupBy(_._1).toSeq.map { case (src, rs) =>
      (src, rs.size.toLong, rs.map(_._2).distinct.size.toLong,
        rs.map(r => r._2 * r._3).sum) }.sortBy(_._1)
    val got = Analytics13.q_mix_upsample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == want)
    // Σ(doc_id·copy) distinguishes real tagged copies from a multiplied
    // count: a doc with 2 copies contributes id·1 + id·2 = 3·id ≠ 2·id
    assert(expanded.exists(_._3 == 2L), "fixture must actually upsample")
  }

  test("q_dedup_keepbest equals a plain-Scala argmax; tie breaks to the LOWER doc_id") {
    val want = docs.groupBy(d => (d._2, d._3)).toSeq
      .map { case ((lang, _), rs) =>
        val best = rs.minBy(d => (-d._5, d._1)) // n_chars DESC, doc_id ASC
        (lang, best) }
      .groupBy(_._1).toSeq
      .map { case (lang, rs) =>
        (lang, rs.size.toLong, rs.map(_._2._5).sum, rs.map(_._2._1).sum) }
      .sortBy(_._1)
    val got = Analytics13.q_dedup_keepbest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("keep-best tie direction on a hand fixture: equal n_chars keeps the smaller id") {
    val t = Seq(
      (1L, "en", "web", "x", 100L),
      (2L, "en", "web", "y", 100L), // tie with doc 1 — must LOSE (higher id)
      (3L, "en", "web", "z", 50L),
      (9L, "de", "web", "w", 10L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
    t.createOrReplaceTempView("a13_keepbest_fix")
    val got = t.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"), col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rk") === 1).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 9L))
  }

  test("q_ab_mannwhitney equals a plain-Scala doubled-tie-rank fold; U2a + U2b = 2·na·nb") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = rows.groupBy(_._1).toSeq.map { case (t, rs) =>
      val vals = rs.map(r => (r._3, r._2 % 2 == 0)).sortBy(_._1)
      // doubled tie-averaged rank per distinct value: 2·below + tie + 1
      val byV = vals.groupBy(_._1)
      val r2a = byV.map { case (v, grp) =>
        val below = vals.count(_._1 < v).toLong
        val tie = grp.size.toLong
        val avg2 = 2L * below + tie + 1L
        grp.count(_._2).toLong * avg2
      }.sum
      val na = vals.count(_._2).toLong
      val nb = vals.size - na
      val u2a = r2a - na * (na + 1)
      (t, na, nb, u2a, 2L * na * nb - u2a)
    }.sortBy(_._1)
    val got = Analytics13.q_ab_mannwhitney(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty && got == want)
    // identity: the two U statistics always partition 2·na·nb
    assert(got.forall(r => r._4 + r._5 == 2L * r._2 * r._3))
  }

  test("Mann-Whitney doubled tie-ranks on a hand-derived tied fixture") {
    // one type, values (cents): A = {10, 20, 20}, B = {20, 30}.
    // sorted: 10(A), 20, 20, 20 (A,A,B), 30(B)
    // avg2(10) = 2·0+1+1 = 2 (rank 1 doubled); avg2(20) = 2·1+3+1 = 6
    // (ranks 2,3,4 average 3); avg2(30) = 2·4+1+1 = 10 (rank 5 doubled)
    // R2a = 2 + 6 + 6 = 14; na=3 → U2a = 14 − 12 = 2 — cross-check by
    // direct pair counting: #(a>b) = 0 plus 2 ties at ½ each → U_A = 1,
    // doubled 2 ✓; U2b = 2·na·nb − U2a = 12 − 2 = 10
    val fix = Seq(
      ("t", 2L, 0.10), ("t", 4L, 0.20), ("t", 6L, 0.20), // even user_id → A
      ("t", 1L, 0.20), ("t", 3L, 0.30))                  // odd → B
      .toDF("event_type", "user_id", "value")
    val hist = fix.select(col("event_type").as("t"),
        (col("user_id") % 2 === 0).cast("long").as("is_a"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .groupBy(col("t"), col("c"))
      .agg(count(lit(1)).as("n"), sum(col("is_a")).as("na"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t")).orderBy(col("c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = hist
      .withColumn("cumIncl", sum(col("n")).over(w))
      .withColumn("avg2", lit(2L) * (col("cumIncl") - col("n")) + col("n") + 1L)
      .groupBy(col("t"))
      .agg(sum(col("na") * col("avg2")).as("r2a"), sum(col("na")).as("na"))
      .head()
    assert(got.getAs[Long]("r2a") == 14L && got.getAs[Long]("na") == 3L)
  }

  test("q_eval_confusion equals a plain-Scala confusion fold with integer-div bp") {
    val en = Set("the", "and", "of", "a", "to"); val de = Set("der", "die", "und", "das")
    val es = Set("el", "la", "los", "y"); val fr = Set("le", "les", "et", "un")
    val pred = docs.map { case (_, lang, _, text, _) =>
      val ws = text.split(" ").toSeq
      val (nEn, nDe, nEs, nFr) =
        (ws.count(en), ws.count(de), ws.count(es), ws.count(fr))
      val p =
        if (nEn >= nDe && nEn >= nEs && nEn >= nFr && nEn > 0) "en"
        else if (nDe >= nEs && nDe >= nFr && nDe > 0) "de"
        else if (nEs >= nFr && nEs > 0) "es"
        else if (nFr > 0) "fr" else "unknown"
      (lang, p) }
    val conf = pred.groupBy(identity).map { case (k, rs) => (k._1, k._2, rs.size.toLong) }.toSeq
    val truthN = conf.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3).sum }
    val predN = conf.groupBy(_._2).map { case (p, rs) => p -> rs.map(_._3).sum }
    val want = conf.map { case (l, p, n) =>
      (l, p, n, truthN(l), predN(p), 10000L * n / truthN(l), 10000L * n / predN(p)) }
      .sortBy(r => (r._1, r._2))
    val got = Analytics13.q_eval_confusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty && got == want)
    // non-vacuity: the heuristic is imperfect — off-diagonal cells exist
    assert(want.exists(r => r._1 != r._2))
  }

  test("q_dq_rules equals a plain-Scala one-pass rule fold") {
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val rules: Seq[(String, ((Long, Long, Double, Option[Long])) => Boolean)] = Seq(
      "props_k_band" -> (r => !r._4.exists(k => k >= 10 && k <= 80)),
      "user_id_lt_100" -> (r => !(r._2 < 100)),
      "value_le_400" -> (r => !(r._3 <= 400.0)),
      "value_nonneg" -> (r => !(r._3 >= 0.0)))
    val n = rows.size.toLong
    val want = rules.map { case (name, bad) =>
      val v = rows.filter(bad)
      (name, n, v.size.toLong, 10000L * v.size / n,
        if (v.isEmpty) None else Some(v.map(_._1).min)) }.sortBy(_._1)
    val got = Analytics13.q_dq_rules(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got.nonEmpty && got == want)
    // non-vacuity: at least one rule fires and at least one is clean
    assert(want.exists(_._3 > 0) && want.exists(_._3 == 0))
  }

  test("q_dedup_cluster_star agrees with min-label CC on the same query frame") {
    val star = Analytics13.q_dedup_cluster_star(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val minl = graft.queries.LlmExt.q_dedup_cluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(star.nonEmpty && star == minl)
  }
}
