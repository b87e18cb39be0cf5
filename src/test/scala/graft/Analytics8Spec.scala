package graft

import graft.queries.Analytics8
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the detection tier (SURVEY
  * §2.24), beyond the DuckDB hash gate: every statistic is rebuilt in
  * plain Scala BigInt from a collected copy of the sf0.001 events — a
  * second implementation with no Spark expression tree in common, so a
  * formulation error on both engine sides (which the oracle cannot see)
  * would still surface here. */
class Analytics8Spec extends AnyFunSuite with SparkFixture {

  private case class Ev(id: Long, user: Long, etype: String, tsUs: Long, cents: Long)

  private lazy val evs: Seq[Ev] = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"),
      floor(col("value") * 100 + 0.5).cast("long").as("c"))
    .collect()
    .map(r => Ev(r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    .toSeq

  test("q_conc_gini equals the definitional mean-absolute-difference Gini") {
    val got = Analytics8.q_conc_gini(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = evs.groupBy(_.etype).toSeq.sortBy(_._1).map { case (t, rows) =>
      val x = rows.groupBy(_.user).map { case (_, es) => BigInt(es.map(_.cents).sum) }.toSeq
      val n = BigInt(x.size)
      val mad = (for (a <- x; b <- x) yield (a - b).abs).sum // Σij |xi−xj|
      // G = MAD / (2 n Σx); floored bp — independent of the rank identity
      val bp = (BigInt(10000) * mad) / (2 * n * x.sum)
      (t, x.size.toLong, bp.toLong)
    }
    assert(got.nonEmpty && got.toSeq == want)
  }

  test("q_scan_hhi equals a plain-Scala Herfindahl recompute") {
    val got = Analytics8.q_scan_hhi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    val want = evs.groupBy(_.user).toSeq.map { case (u, rows) =>
      val ni = rows.groupBy(_.etype).map(_._2.size).map(BigInt(_)).toSeq
      val n = ni.sum; val s2 = ni.map(i => i * i).sum
      (u, n.toLong, ni.size.toLong, ((BigInt(10000) * s2) / (n * n)).toLong,
        s2 * 4 < n * n)
    }.sortBy(t => (t._4, t._1)).take(20)
    assert(got.nonEmpty && got.toSeq == want)
  }

  test("q_bot_cadence equals a plain-Scala CV² recompute; constant cadence flags bot") {
    val got = Analytics8.q_bot_cadence(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val want = evs.groupBy(_.user).toSeq.flatMap { case (u, rows) =>
      val ts = rows.sortBy(e => (e.tsUs, e.id)).map(_.tsUs / 1000000)
      val g = ts.zip(ts.tail).map { case (a, b) => BigInt(b - a) }
      val m = BigInt(g.size); val sg = g.sum; val sg2 = g.map(x => x * x).sum
      if (g.isEmpty || sg <= 0) None
      else Some((u, m.toLong, ((BigInt(10000) * (m * sg2 - sg * sg)) / (sg * sg)).toLong,
        (m * sg2 - sg * sg) * 4 <= sg * sg))
    }.sortBy(t => (t._3, t._1)).take(20)
    assert(got.nonEmpty && got.toSeq == want)
    // and the flag's semantics on a synthetic perfectly-regular cadence:
    // CV² = 0 → bot; the same gaps with one 10× outlier → not a bot
    def cv2(gaps: Seq[Long]): (BigInt, Boolean) = {
      val m = BigInt(gaps.size); val sg = BigInt(gaps.sum)
      val sg2 = gaps.map(x => BigInt(x) * x).sum
      ((BigInt(10000) * (m * sg2 - sg * sg)) / (sg * sg),
        (m * sg2 - sg * sg) * 4 <= sg * sg)
    }
    assert(cv2(Seq.fill(50)(60L)) == (BigInt(0), true))
    assert(!cv2(Seq.fill(49)(60L) :+ 600L)._2)
  }

  test("q_change_cusum equals a plain-Scala scaled-CUSUM argmax") {
    val got = Analytics8.q_change_cusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = evs.groupBy(_.etype).toSeq.sortBy(_._1).map { case (t, rows) =>
      val ord = rows.sortBy(e => (e.tsUs, e.id))
      val n = BigInt(ord.size); val s = BigInt(ord.map(_.cents).sum)
      var rs = BigInt(0)
      val devs = ord.zipWithIndex.map { case (e, i) =>
        rs += e.cents
        (e, (n * rs - BigInt(i + 1) * s).abs)
      }
      val best = devs.maxBy { case (e, d) => (d, -e.tsUs, -e.id) } // earliest on ties
      (t, ord.size.toLong, best._1.tsUs / 1000000, (best._2 / n).toLong)
    }
    assert(got.nonEmpty && got.toSeq == want)
  }

  test("q_rate_peak equals a plain-Scala sliding-window recompute") {
    val got = Analytics8.q_rate_peak(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val want = evs.groupBy(_.user).toSeq.map { case (u, rows) =>
      val ts = rows.map(_.tsUs / 1000000).sorted
      val peak = ts.map(t => ts.count(s => s >= t - 59 && s <= t)).max.toLong
      val (n, lo, hi) = (ts.size.toLong, ts.min, ts.max)
      val span = hi - lo + 1
      (u, n, peak, span, (BigInt(10000) * peak * span / (60 * BigInt(n))).toLong)
    }.sortBy(t => (-t._5, t._1)).take(20)
    assert(got.nonEmpty && got.toSeq == want)
  }

  test("q_contam_semantic equals a brute-force same-cell scan with a live flag") {
    val got = Analytics8.q_contam_semantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toIndexedSeq))
    def dot(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = { // FloatDot's L2R fold
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val train = vecs.filter(_._1 % 20 != 0)
    val want = vecs.filter(_._1 % 20 == 0).sortBy(_._1).flatMap { case (id, cell, va) =>
      val cand = train.filter(_._2 == cell)
        .map { case (tid, _, vb) => (tid, math.floor(10000.0 * dot(va, vb)).toLong) }
      if (cand.isEmpty) None
      else Some {
        val best = cand.minBy { case (tid, bp) => (-bp, tid) }
        (id, best._1, best._2, best._2 >= 3000L)
      }
    }.toSeq
    assert(got.nonEmpty && got.toSeq == want)
    assert(want.exists(_._4), "vacuous: no contaminated eval vector in the corpus")
  }

  test("q_index_phrase: the posting join finds exactly the scan's phrase hits") {
    val got = Analytics8.q_index_phrase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
      .flatMap { case (id, ws) =>
        val n = ws.indices.dropRight(1)
          .count(i => ws(i) == "order" && ws(i + 1) == "fast").toLong
        if (n > 0) Some((id, n)) else None
      }.sortBy(_._1).toSeq
    assert(got.nonEmpty && got.toSeq == want)
  }

  test("q_ip_lpm routes by longest prefix: counts match a per-flow Scala LPM") {
    val got = Analytics8.q_ip_lpm(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val want = evs.map { e =>
      val (s, t) = (e.user % 10, e.id % 13)
      if (s == 4 && t == 9) ("honeypot", 24)
      else if (s == 2) ("dc-east", 16)
      else if (s == 4) ("dc-west", 16)
      else ("as-backbone", 8)
    }.groupBy(identity).toSeq
      .map { case ((r, m), v) => (r, m, v.size.toLong) }
      .sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // all three specificity tiers must be live, and the /24 must have
    // stolen its flows from the enclosing /16
    assert(want.map(_._2).toSet == Set(8, 16, 24))
  }

  test("q_churn equals a plain-Scala day-set reconciliation") {
    val got = Analytics8.q_churn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val byDay = evs.map(e => (e.tsUs / 86400000000L, e.user)).distinct
      .groupBy(_._1).map { case (d, us) => d -> us.map(_._2).toSet }
    val want = byDay.keys.toSeq.sorted.flatMap { d =>
      byDay.get(d - 1).map { prev =>
        val cur = byDay(d); val ret = (cur & prev).size.toLong
        (d, cur.size.toLong, cur.size - ret, ret, prev.size - ret)
      }
    }
    assert(got.nonEmpty && got.toSeq == want)
  }

  test("q_seq_transitions equals a plain-Scala Markov count; rows are row-stochastic") {
    val got = Analytics8.q_seq_transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val trans = evs.groupBy(_.user).toSeq.flatMap { case (_, rows) =>
      val ord = rows.sortBy(e => (e.tsUs, e.id)).map(_.etype)
      ord.zip(ord.tail)
    }
    val counts = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val outTot = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val want = counts.toSeq.map { case ((p, t), n) =>
      (p, t, n, 10000L * n / outTot(p))
    }.sortBy(x => (x._1, x._2))
    assert(got.nonEmpty && got.toSeq == want)
    // each source row's probabilities must sum to within rounding of 10^4
    got.groupBy(_._1).foreach { case (p, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 10000 && s > 10000 - rs.size, s"row $p not stochastic: $s")
    }
  }

  test("q_graph_lpa equals a plain-Scala 3-round synchronous label propagation") {
    val got = Analytics8.q_graph_lpa(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toIndexedSeq))
    def dot(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val nbrs = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    for (a <- vecs; b <- vecs
         if a._1 < b._1 && a._2 == b._2 &&
           math.floor(10000.0 * dot(a._3, b._3)) >= 3000) {
      nbrs(a._1) = b._1 :: nbrs(a._1); nbrs(b._1) = a._1 :: nbrs(b._1)
    }
    var lbl = vecs.map(v => v._1 -> v._1).toMap
    for (_ <- 1 to 3) {
      lbl = lbl.map { case (id, own) =>
        val votes = nbrs(id).map(lbl)
        if (votes.isEmpty) id -> own
        else id -> votes.groupBy(identity).toSeq
          .map { case (l, vs) => (l, vs.size) }
          .minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.toSeq.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // communities must be non-trivial: at least one label adopted, and
    // fewer distinct labels than nodes
    assert(want.exists { case (id, l) => id != l })
    assert(want.map(_._2).distinct.size < want.size)
  }

  test("q_outage_maxgap equals a plain-Scala longest-gap scan") {
    val got = Analytics8.q_outage_maxgap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = evs.groupBy(_.user).toSeq.flatMap { case (u, rows) =>
      val ts = rows.sortBy(e => (e.tsUs, e.id)).map(_.tsUs / 1000000)
      val gaps = ts.zip(ts.tail).map { case (a, b) => (b - a, a) }
      if (gaps.isEmpty) None
      else Some { val g = gaps.maxBy { case (d, st) => (d, -st) }; (u, g._1, g._2) }
    }.sortBy(t => (-t._2, t._1)).take(20)
    assert(got.nonEmpty && got.toSeq == want)
  }
}
