package graft

import graft.queries.Analytics14
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.31 analytics
  * additions (the §2.30 spec discipline: oracle-green-by-construction is
  * not enough), plus the plan contracts that make them 100 TB-shaped. */
class Analytics14Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("q_eval_calibration equals a plain-Scala bucket fold; buckets partition the corpus") {
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = rows.map { case (eid, uid) =>
      (Math.floorMod(eid * 2654435761L, 10000L), if (uid % 2 == 0) 1L else 0L) }
      .groupBy(_._1 / 1000L).toSeq
      .map { case (b, rs) =>
        val n = rs.size.toLong
        val pos = rs.map(_._2).sum
        (b, n, pos, rs.map(_._1).sum / n, 10000L * pos / n) }
      .sortBy(_._1)
    val got = Analytics14.q_eval_calibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty && got == want)
    assert(got.map(_._2).sum == rows.size.toLong, "buckets must partition the corpus")
    assert(got.forall(r => r._1 >= 0 && r._1 <= 9))
  }

  test("q_text_langmix equals a plain-Scala family fold; a constructed doc mixes") {
    val fams = Seq(Set("the", "and", "of", "a", "to"), Set("der", "die", "und", "das"),
      Set("el", "la", "los", "y"), Set("le", "les", "et", "un"))
    val docs = Tables.documents(spark, sf).select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = docs.map { case (lang, text) =>
      val ws = text.split(" ").toSet
      (lang, fams.count(f => ws.exists(f)).toLong) }
      .groupBy(_._1).toSeq
      .map { case (lang, rs) =>
        val n = rs.size.toLong
        val mixed = rs.count(_._2 >= 2).toLong
        (lang, n, mixed, 10000L * mixed / n, rs.map(_._2).sum) }
      .sortBy(_._1)
    val got = Analytics14.q_text_langmix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty && got == want)
    // the sf0.001 corpus vocabulary is mono-family (n_mixed legitimately
    // all 0 — the oracle pins that too); the detector's MECHANISM is
    // pinned on a constructed bilingual doc instead
    val fix = Seq(("en", "the der agg window"), ("en", "the and agg"), ("de", "zzz"))
      .toDF("lang", "text")
    def fam(words: String): org.apache.spark.sql.Column =
      (expr(s"size(filter(split(text, ' '), w -> w IN ($words)))") > 0).cast("long")
    val mixed = fix.select(col("lang"),
        (fam("'the','and','of','a','to'") + fam("'der','die','und','das'")).as("fams"))
      .groupBy(col("lang"))
      .agg(sum((col("fams") >= 2).cast("long")).as("n_mixed"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mixed("en") == (1L, 2L), "the bilingual doc alone must flag")
    assert(mixed("de") == (0L, 1L), "no-family text must not flag")
  }

  test("q_audit_duprate equals a plain-Scala text fold; dup volume only counts extras") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val want = docs.groupBy(d => (d._1, d._2)).toSeq
      .map { case ((src, _), rs) =>
        (src, rs.size.toLong, rs.map(_._3).sum, rs.map(_._3).min) }
      .groupBy(_._1).toSeq
      .map { case (src, rs) =>
        val n = rs.map(_._2).sum
        val dis = rs.size.toLong
        (src, n, dis, 10000L * (n - dis) / n, rs.map(r => r._3 - r._4).sum) }
      .sortBy(_._1)
    val got = Analytics14.q_audit_duprate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty && got == want)
    // every source's dup volume is the reclaimable EXTRA, never the corpus
    assert(got.forall(r => r._5 >= 0 && r._2 >= r._3))
  }

  test("§2.31 plan contracts: calibration and langmix are one scan, no join, two-phase") {
    for (name <- Seq("q_eval_calibration", "q_text_langmix")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Scan parquet".r.findAllIn(plan).size == 1,
        s"$name must scan once:\n$plan")
      assert(!plan.contains("Join"), s"$name must not join:\n$plan")
      assert(plan.contains("partial_count") || plan.contains("partial_sum"),
        s"$name aggregate not two-phase:\n$plan")
      // the per-doc/per-event derivation is map-side: no Generate (explode)
      assert(!plan.contains("Generate"), s"$name must not explode:\n$plan")
    }
  }
}
