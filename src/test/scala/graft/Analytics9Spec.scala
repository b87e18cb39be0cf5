package graft

import graft.queries.{Analytics9, LlmExt}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.25 additions, beyond
  * the DuckDB hash gate (the Analytics8Spec discipline): each statistic
  * or structure is rebuilt in plain Scala from collected sf0.001 inputs —
  * a second implementation sharing no Spark expression tree, so an error
  * formulated identically on both engine sides still surfaces here. */
class Analytics9Spec extends AnyFunSuite with SparkFixture {

  // ---- similarity-graph fixture: the pair list collected ONCE, edges
  // rebuilt in plain Scala sets (shared by linkpred + kcore tests)
  private lazy val pairs: Seq[(Long, Long)] = {
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 1000)
    LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }
  private lazy val nbrs: Map[Long, Set[Long]] =
    (pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  test("q_url_canon: canonicalization by string surgery equals part-wise rebuild") {
    val got = Analytics9.q_url_canon(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = docs
      .map { case (id, src) =>
        (s"http://www.$src.example.com/item/${id % 10}?a=${id % 5}&b=${id % 3}", id)
      }
      .groupBy(_._1).toSeq.map { case (u, ds) =>
        (u, ds.size.toLong, ds.map(_._2).min)
      }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: real duplicate groups exist, and the canonical form
    // actually erased case, port, fragment and tracking params
    assert(want.exists(_._2 > 1))
    assert(want.forall { case (u, _, _) =>
      !u.contains("#") && !u.contains("utm_") && !u.contains(":80") &&
        u == u.toLowerCase
    })
  }

  test("q_ts_autocorr equals a plain-Scala BigInt Pearson over lag pairs") {
    val got = Analytics9.q_ts_autocorr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6))).toSeq
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val c = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val xy = c.zip(c.tail) // (prev, cur)
      val m = BigInt(xy.size)
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxy = xy.map(p => BigInt(p._1) * p._2).sum
      val sx2 = xy.map(p => BigInt(p._1) * p._1).sum
      val sy2 = xy.map(p => BigInt(p._2) * p._2).sum
      val num = m * sxy - sx * sy
      val dx = m * sx2 - sx * sx
      val dy = m * sy2 - sy * sy
      if (xy.isEmpty || dx <= 0 || dy <= 0) None
      else Some((u, m.toLong, num.toLong, dx.toLong, dy.toLong,
        num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)),
        num < 0))
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: both signs of memory occur on this corpus
    assert(want.exists(_._7) && want.exists(!_._7))
  }

  test("q_graph_linkpred equals brute-force neighbor-set intersection") {
    val got = Analytics9.q_graph_linkpred(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val edgeSet = pairs.toSet
    val nodes = nbrs.keys.toSeq.sorted
    val all = for {
      a <- nodes; b <- nodes if a < b && !edgeSet((a, b))
      common = (nbrs(a) & nbrs(b)).size if common > 0
    } yield {
      val (da, db) = (nbrs(a).size.toLong, nbrs(b).size.toLong)
      (a, b, common.toLong, da, db, 10000L * common / (da + db - common))
    }
    val want = all.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(50)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: predictions exist that are NOT already edges (by
    // construction) and at least one has ≥2 common neighbors
    assert(want.exists(_._3 >= 2))
  }

  test("q_graph_kcore equals an iterative peel run to FIXPOINT") {
    val got = Analytics9.q_graph_kcore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // plain-Scala peel, iterated until stable — if three unrolled rounds
    // were NOT enough on this corpus, this differential fails and the
    // round count must rise
    var es = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    val want = es.groupBy(_._1).toSeq
      .map { case (k, v) => (k, v.size.toLong) }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the peel removed at least one node a raw degree≥2
    // filter would have kept (the leaf-cascade case k-core exists for)
    val deg0 = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val survivors = want.map(_._1).toSet
    assert(deg0.exists { case (n, d) => d >= 2 && !survivors(n) },
      "peeling was vacuous: no degree>=2 node was cascaded out " +
        "(corpus too dense to exercise k-core; tighten minBp)")
  }

  test("q_graph_ppr equals a plain-Scala seeded power iteration") {
    val got = Analytics9.q_graph_ppr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val ids = Tables.embeddings(spark, sf).filter(col("vec_id") < 1000)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq.sorted
    val symE = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = symE.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val seed = ids.map(i => i -> (if (i % 50 == 0) 1L else 0L)).toMap
    def push(contrib: Map[Long, Long]): Map[Long, Long] =
      symE.filter(e => contrib.contains(e._1))
        .groupBy(_._2).map { case (b, es) => b -> es.map(e => contrib(e._1)).sum }
    val c1 = ids.filter(i => seed(i) == 1L && deg.contains(i))
      .map(i => i -> 1000000L / deg(i)).toMap
    val in1 = push(c1)
    val r1 = ids.map(i => i ->
      ((15L * 1000000L * seed(i) + 85L * in1.getOrElse(i, 0L)) / 100L)).toMap
    val c2 = ids.filter(deg.contains).map(i => i -> r1(i) / deg(i)).toMap
    val in2 = push(c2)
    val top = ids.map(i => (i, seed(i),
        (15L * 1000000L * seed(i) + 85L * in2.getOrElse(i, 0L)) / 100L))
      .filter(_._3 > 0)
      .sortBy(r => (-r._3, r._1)).take(30)
    val want = top.zipWithIndex.map { case ((i, s, p), k) => (i, s, p, k + 1) }
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: restart mass must have PROPAGATED — the top must hold
    // at least one non-seed with positive score, and at least one seed
    assert(want.exists(_._2 == 0L) && want.exists(_._2 == 1L))
  }

  test("q_stat_chisq equals a plain-Scala contingency recompute") {
    val got = Analytics9.q_stat_chisq(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7), r.getBoolean(8))).toSeq
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // weekday by epoch arithmetic, recomputed from raw micros in plain Scala
    val typed = evs.map { case (t, us) =>
      (t, (java.lang.Math.floorDiv(us, 86400000000L) + 4) % 7)
    }
    val cells = typed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rt = typed.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val ct = typed.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = typed.size.toLong
    val want = cells.toSeq.map { case ((t, dow), o) =>
      val resid = n * o - rt(t) * ct(dow)
      val contrib = (resid.toDouble * resid.toDouble) / (n * rt(t) * ct(dow)).toDouble
      (t, dow, o, rt(t), ct(dow), n, resid, contrib, resid > 0)
    }.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the corpus must show both over- and under-represented
    // cells (resid is zero-sum across the table, so both exist unless
    // the table is perfectly independent — which would gut the gate)
    assert(want.exists(_._9) && want.exists(!_._9))
  }

  test("q_stat_moments equals a plain-Scala BigInt moment recompute") {
    val got = Analytics9.q_stat_moments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8), r.getDouble(9), r.getDouble(10), r.getBoolean(11))).toSeq
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ys = rows.map(r => math.floor(r._2 + 0.5).toLong)
      val m = BigInt(ys.size)
      val s1 = ys.map(BigInt(_)).sum
      val s2 = ys.map(y => BigInt(y) * y).sum
      val s3 = ys.map(y => BigInt(y) * y * y).sum
      val s4 = ys.map(y => BigInt(y) * y * y * y).sum
      val m2n = m * s2 - s1 * s1
      val m3n = m * m * s3 - 3 * m * s1 * s2 + 2 * s1 * s1 * s1
      val m4n = m * m * m * s4 - 4 * m * m * s1 * s3 +
        6 * m * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      if (m2n <= 0) None
      else {
        val skew = (math.sqrt(m.toDouble) * m3n.toDouble) /
          (m2n.toDouble * math.sqrt(m2n.toDouble))
        val kurt = (m.toDouble * m4n.toDouble) /
          (m2n.toDouble * m2n.toDouble) - 3.0
        Some((u, m.toLong, s1.toLong, s2.toLong, s3.toLong, s4.toLong,
          m2n.toLong, m3n.toLong, m4n.toDouble, skew, kurt, m3n > 0))
      }
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: shape must actually vary across hosts (a constant
    // distribution would gut the gate; this corpus's non-negative values
    // make every host right-skewed, so the SIGN is not the discriminator
    // — spread is)
    assert(want.map(_._10).distinct.size > 1 &&
      (want.map(_._10).max - want.map(_._10).min) > 0.5,
      "vacuous: per-host skewness barely varies")
  }

  test("moments DECIMAL(38,0) path survives past int64 on a constructed series") {
    import spark.implicits._
    // m=99 samples at the corpus value ceiling (~570 units) pushes the
    // raw 4th-moment term m³Σy⁴ to ~1.02e19 — past Long.MaxValue
    // (9.2e18) — which the corpus itself only reaches at sf0.1, a tier
    // the correctness gate never runs. Alternating ±2 around 568 keeps
    // variance positive; exact BigInt is the referee.
    val ys = (0 until 99).map(i => 568L + (if (i % 2 == 0) 2L else -2L))
    val df = ys.zipWithIndex.map { case (y, i) => (7L, y, i) }
      .toDF("user_id", "y", "i").select(col("user_id"), col("y"))
    val got = graft.queries.Analytics9.momentsOf(df).collect().map(r =>
      (r.getLong(1), r.getLong(6), r.getLong(7), r.getDouble(8),
        r.getDouble(9), r.getDouble(10))).toSeq
    val m = BigInt(ys.size)
    val s1 = ys.map(BigInt(_)).sum
    val s2 = ys.map(y => BigInt(y) * y).sum
    val s3 = ys.map(y => BigInt(y) * y * y).sum
    val s4 = ys.map(y => BigInt(y) * y * y * y).sum
    assert(m * m * m * s4 > BigInt(Long.MaxValue),
      "construction failed to cross the int64 edge")
    val m2n = m * s2 - s1 * s1
    val m3n = m * m * s3 - 3 * m * s1 * s2 + 2 * s1 * s1 * s1
    val m4n = m * m * m * s4 - 4 * m * m * s1 * s3 +
      6 * m * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
    val skew = (math.sqrt(m.toDouble) * m3n.toDouble) /
      (m2n.toDouble * math.sqrt(m2n.toDouble))
    val kurt = (m.toDouble * m4n.toDouble) / (m2n.toDouble * m2n.toDouble) - 3.0
    assert(got == Seq((m.toLong, m2n.toLong, m3n.toLong, m4n.toDouble, skew, kurt)))
  }

  // events collected once in (ts, event_id) order per host, cents-quantized
  private lazy val hostSeries: Map[Long, Seq[(Long, Long, Long)]] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(r => (r._2, r._3, r._4))
      }

  test("q_ts_hampel equals a plain-Scala rolling median/MAD sweep") {
    val got = Analytics9.q_ts_hampel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    val want = hostSeries.toSeq.flatMap { case (u, series) =>
      series.sliding(5).filter(_.size == 5).map { win =>
        val (tsU, eid, y) = win(2)
        val sorted = win.map(_._3).sorted
        val med = sorted(2)
        val mad = sorted.map(v => math.abs(v - med)).sorted.apply(2)
        val dev = math.abs(y - med)
        (u, tsU, eid, y, med, mad, dev, dev * 10000L > mad * 44478L)
      }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the detector must fire somewhere and NOT everywhere
    assert(want.exists(_._8) && want.exists(!_._8))
  }

  test("q_ts_bollinger equals a plain-Scala trailing-window band recompute") {
    val got = Analytics9.q_ts_bollinger(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7),
        r.getBoolean(8), r.getDouble(9))).toSeq
    val want = hostSeries.toSeq.flatMap { case (u, series) =>
      series.indices.filter(_ >= 9).map { i =>
        val win = series.slice(i - 9, i + 1).map(_._3)
        val (tsU, eid, y) = series(i)
        val m = 10L
        val s1 = win.sum
        val s2 = win.map(v => v * v).sum
        val devN = m * y - s1
        val varN = m * s2 - s1 * s1
        (u, tsU, eid, y, s1, varN, devN, devN * devN > 4L * varN, devN > 0,
          math.sqrt((4L * varN).toDouble) / m.toDouble)
      }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: breaches fire somewhere but not everywhere, and the
    // below-mean side occurs (the corpus's right-skew makes DOWNWARD 2σ
    // breaches absent at this scale — above-band breaches plus calm
    // below-mean rows still pin both sign paths of dev_n)
    assert(want.exists(r => r._8 && r._9) && want.exists(!_._8) &&
      want.exists(r => !r._9 && !r._8))
  }

  test("q_graph_assort equals a plain-Scala Newman recompute") {
    val got = Analytics9.q_graph_assort(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    val symE = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = symE.groupBy(_._1).map { case (k, v) => k -> BigInt(v.size) }
    val ks = symE.map { case (a, b) => (deg(a), deg(b)) }
    val m = BigInt(ks.size)
    val sx = ks.map(_._1).sum; val sy = ks.map(_._2).sum
    val sxy = ks.map(k => k._1 * k._2).sum
    val sx2 = ks.map(k => k._1 * k._1).sum
    val sy2 = ks.map(k => k._2 * k._2).sum
    val num = m * sxy - sx * sy
    val dx = m * sx2 - sx * sx; val dy = m * sy2 - sy * sy
    val assort = num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
    assert(got == Seq((m.toLong, num.toLong, dx.toLong, dy.toLong, assort, num < 0)))
    // non-vacuity: the statistic must be meaningfully nonzero — a
    // degree-uncorrelated graph would make the gate insensitive
    assert(math.abs(assort) > 0.01)
  }

  test("q_ts_coverage equals a plain-Scala interval-union sweep") {
    val got = Analytics9.q_ts_coverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val want = hostSeries.toSeq.map { case (u, series) =>
      val iv = series.map { case (s, eid, y) => (s, eid, s + y * 10000L) }
        .sortBy(r => (r._1, r._2))
      var pmax = Long.MinValue
      var (covered, segs, sumDur) = (0L, 0L, 0L)
      for ((s, _, e) <- iv) {
        sumDur += e - s
        if (pmax == Long.MinValue || s > pmax) segs += 1
        val base = if (pmax == Long.MinValue) s else math.max(s, pmax)
        covered += math.max(0L, e - base)
        pmax = math.max(pmax, e)
      }
      (u, iv.size.toLong, sumDur, covered, segs, sumDur - covered)
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: real overlap somewhere (union < naive sum) and more
    // than one connected segment somewhere (gaps exist)
    assert(want.exists(_._6 > 0) && want.exists(_._5 > 1))
  }
}
