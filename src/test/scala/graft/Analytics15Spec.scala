package graft

import graft.queries.Analytics15
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.32 query-tier
  * additions (the §2.30/§2.31 spec discipline: oracle-green-by-
  * construction is not enough — each query is re-derived in plain
  * Scala, plus the algorithmic properties the SQL can't state). */
class Analytics15Spec extends AnyFunSuite with SparkFixture {

  private def docs: Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("q_dedup_incremental equals a plain-Scala index recompute") {
    val all = docs
    val existing = all.filter(d => (d._1 / 20) % 4 != 3).map(_._2).toSet
    val want = all.filter(d => (d._1 / 20) % 4 == 3)
      .groupBy(_._3).toSeq.map { case (src, ds) =>
        val novel = ds.filterNot(d => existing.contains(d._2))
        (src, ds.size.toLong, novel.size.toLong, novel.map(_._4).sum,
          10000L * (ds.size - novel.size) / ds.size)
      }.sortBy(_._1)
    val got = Analytics15.q_dedup_incremental(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty && got == want)
    // every source appears: the block striping must not correlate with
    // the generator's source assignment (the round-11 design note)
    assert(got.map(_._1).toSet == all.map(_._3).toSet)
  }

  test("q_mix_budget equals the plain-Scala water-filling fold; waterline is maximal") {
    val avail = docs.groupBy(_._3).map { case (s, ds) =>
      s -> ds.map(_._4 / 4).sum }.toSeq.sortBy(_._1)
    val total = avail.map(_._2).sum
    val b = 9L * total / 10L
    // reference water-filling: exact greedy over ascending availability
    val asc = avail.sortBy(x => (x._2, x._1))
    val n = asc.size.toLong
    var kstar = 0
    var prefix = 0L
    var pstar = 0L
    var run = 0L
    asc.zipWithIndex.foreach { case ((_, a), i) =>
      run += a
      if (run + (n - i - 1) * a <= b) { kstar = i + 1; pstar = run }
    }
    val t = (b - pstar) / (n - kstar)
    val want = avail.map { case (s, a) =>
      val k = asc.indexWhere(_._1 == s) + 1
      val alloc = if (k <= kstar) a else math.min(a, t)
      (s, a, alloc, 10000L * alloc / b)
    }
    val got = Analytics15.q_mix_budget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == want)
    // allocation properties: within budget, and the waterline is
    // MAXIMAL — one more unit of t would overshoot
    val spent = got.map(_._3).sum
    assert(spent <= b, s"allocated $spent over budget $b")
    val overshoot = avail.map { case (_, a) => math.min(a, t + 1) }.sum
    assert(overshoot > b, "waterline must be the largest integer fitting the budget")
    assert(got.exists { case (_, a, alloc, _) => alloc < a },
      "a 9/10 budget must cap at least one source")
    assert(got.exists { case (_, a, alloc, _) => alloc == a },
      "the smallest sources must fit fully under the line")
  }

  test("q_src_overlap equals a plain-Scala bigram-set recompute") {
    val sets = docs.groupBy(_._3).map { case (s, ds) =>
      s -> ds.flatMap { d =>
        val ws = d._2.split(" ")
        ws.iterator.zip(ws.iterator.drop(1)).map { case (a, c) => s"$a $c" }
      }.toSet
    }
    val srcs = sets.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = sets(srcs(i)); c = sets(srcs(j))
      common = (a & c).size if common > 0
    } yield (srcs(i), srcs(j), a.size.toLong, c.size.toLong, common.toLong,
      10000L * common / (a.size + c.size - common))).toSeq
    val got = Analytics15.q_src_overlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got == want)
  }
}
