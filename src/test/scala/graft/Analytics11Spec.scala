package graft

import graft.queries.Analytics11
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.27 additions, beyond
  * the DuckDB hash gate (the Analytics8-10Spec discipline): each
  * statistic rebuilt in plain Scala from collected sf0.001 inputs, plus
  * constructed fixtures with hand-derived expected outputs for the two
  * factored graph mechanisms (weighted-PageRank rounds, Bellman-Ford
  * relaxation depth). */
class Analytics11Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val DayUs = 86400000000L

  private lazy val docs: Seq[(Long, String, String, Long, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq

  test("q_privacy_kanon equals a plain-Scala QI-class fold") {
    val got = Analytics11.q_privacy_kanon(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    val want = docs.groupBy(d => (d._2, d._3, d._4 / 200)).toSeq
      .map { case ((lang, src, lb), rows) =>
        val m = rows.size.toLong
        (lang, src, lb, m, rows.map(_._4).distinct.size.toLong, m >= 5)
      }.sortBy(t => (t._1, t._2, t._3))
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the audit finds both safe and re-identifiable classes
    assert(want.exists(_._6) && want.exists(!_._6))
  }

  test("q_net_fanout equals a plain-Scala per-host profile fold") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val cells = events.groupBy(e => (e._1, Math.floorDiv(e._2, DayUs))).toSeq
      .map { case ((u, day), rows) =>
        (u, day, rows.size.toLong,
          rows.map(r => (r._3 * 2654435761L) % 1024L).distinct.size.toLong)
      }
    val prof = cells.groupBy(_._1).map { case (u, cs) =>
      u -> (cs.map(_._3).sum, cs.size.toLong)
    }
    val want = cells.map { case (u, day, nEv, nPorts) =>
      val (tot, nd) = prof(u)
      (u, day, nEv, nPorts, tot, nd, nPorts >= 6 && nPorts * nd > tot * 2)
    }.sortBy(t => (t._1, t._2))
    val got = Analytics11.q_net_fanout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    assert(want.exists(_._7) && want.exists(!_._7))
  }

  test("q_text_keywords equals a plain-Scala weighted-PageRank recompute") {
    val split = docs.map(d => (d._1, d._5.split(" ", -1).toSeq))
    val nDocs = split.size.toLong
    val vocab = split.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (w, ds) if ds.size * 20 >= nDocs => w }.toSet
    val adj = split.flatMap { case (_, ws) =>
      ws.sliding(2).collect {
        case Seq(a, b) if vocab(a) && vocab(b) => (a, b)
      }
    }
    val e0 = adj.groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }
    val edges = (e0 ++ e0.map { case (a, b, c) => (b, a, c) }).toSeq
      .groupBy(e => (e._1, e._2)).map { case ((a, b), xs) => (a, b, xs.map(_._3).sum) }
      .toSeq
    val wdeg = edges.groupBy(_._1).map { case (w, es) => w -> es.map(_._3).sum }
    def round(rank: String => Long): Map[String, Long] =
      edges.groupBy(_._2).map { case (v, in) =>
        v -> ((15000000L + 85L * in.map { case (u, _, cw) =>
          (rank(u) * cw) / wdeg(u)
        }.sum) / 100L)
      }
    val r1 = round(_ => 1000000L)
    val r2 = round(r1)
    val want = r2.toSeq.sortBy { case (w, r) => (-r, w) }.take(30)
      .zipWithIndex.map { case ((w, r), i) => (w, r, i + 1) }
    val got = Analytics11.q_text_keywords(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: rank order is not plain frequency order somewhere —
    // the graph signal must differ from df counting for TextRank to earn
    // its place beside q_vocab_topk
    val freqTop = adj.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (w, xs) => (w, xs.size) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(30).map(_._1)
    assert(want.map(_._1) != freqTop)
  }

  test("textrankOf: hand-derived two rounds on the path a-b-c") {
    val e0 = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("wa", "wb", "cw")
    val got = Analytics11.textrankOf(e0).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 936250L, "b" -> 1127500L, "c" -> 936250L))
  }

  test("q_graph_sssp equals a plain-Scala Bellman-Ford over min-quantity edges") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1) + 1000000000L, r.getLong(2)))
    val half = li.groupBy(e => (e._1, e._2)).map { case (k, xs) =>
      (k._1, k._2, xs.map(_._3).min)
    }.toSeq
    val edges = half ++ half.map { case (a, b, w) => (b, a, w) }
    val bySrc = edges.groupBy(_._1)
    var dist: Map[Long, Long] =
      half.map(_._1).filter(_ < 10).distinct.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (id, d) =>
        bySrc.getOrElse(id, Seq()).map { case (_, dst, w) => (dst, d + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (id, ds) => id -> ds.map(_._2).min }
    }
    val want = dist.toSeq.map { case (id, d) => (id, d) }.sortBy(t => (t._2, t._1))
    val got = Analytics11.q_graph_sssp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: some node's cheapest route beats its heaviest edge sum
    assert(want.map(_._2).distinct.size > 3)
  }

  test("ssspOf: the diamond where cheapest beats fewest-hops, by round depth") {
    // s(0)—a(1) w=1, a—t(2) w=1, s—t w=5: one round sees only the direct
    // w=5 edge; the second relaxation finds the 2-hop w=2 route
    val e0 = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 5L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("id")
    val got1 = Analytics11.ssspOf(e0, seeds, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got1 == Seq((0L, 0L), (1L, 1L), (2L, 5L)))
    val got2 = Analytics11.ssspOf(e0, seeds, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == Seq((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("q_corpus_card equals a plain-Scala per-language fold") {
    val scored = docs.map { case (id, lang, src, nChars, text) =>
      val ws = text.split(" ", -1)
      (id, lang, src, nChars, ws.length.toLong,
        math.floor(10000.0 * ws.distinct.length / ws.length).toLong)
    }.filter(_._5 > 0)
    val want = scored.groupBy(_._2).toSeq.map { case (lang, rows) =>
      val n = rows.size.toLong
      val sorted = rows.map(_._4).sorted
      val k = ((n + 1) / 2).toInt // ceil(n/2): min n_chars with 2·c_le ≥ n
      (lang, n, rows.map(_._3).distinct.size.toLong, rows.map(_._5).sum,
        rows.map(_._5).sum / n, sorted(k - 1), rows.count(_._6 < 4000).toLong)
    }.sortBy(_._1)
    val got = Analytics11.q_corpus_card(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the low-quality column actually discriminates
    assert(want.exists(_._7 > 0) && want.map(_._6).distinct.size > 1)
  }
}
