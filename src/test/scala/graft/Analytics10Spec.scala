package graft

import graft.queries.{Analytics10, LlmExt}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.26 additions, beyond
  * the DuckDB hash gate (the Analytics8/9Spec discipline): each statistic
  * is rebuilt in plain Scala from collected sf0.001 inputs — a second
  * implementation sharing no Spark expression tree — and each FACTORED
  * mechanism is additionally driven through constructed fixtures the
  * corpus never shows (cliques, stars, constant series, two-point score
  * distributions) with hand-derived expected outputs. */
class Analytics10Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val DayUs = 86400000000L

  // similarity-graph fixture (the Analytics9Spec recipe)
  private lazy val pairs: Seq[(Long, Long)] = {
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 1000)
    LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }
  private lazy val nbrs: Map[Long, Set[Long]] =
    pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  // events fixture: (user_id, ts_us, event_id, event_type, cents)
  private lazy val events: Seq[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"), floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq

  /** Smallest k-th order statistic matching "min v with d·c_le(v) ≥ p·n":
    * the ceil(p·n/d)-th element of the sorted sequence. */
  private def orderStat(sorted: Seq[Long], num: Long, den: Long): Long = {
    val n = sorted.size.toLong
    val k = ((num * n + den - 1) / den).toInt // ceil(num·n/den)
    sorted(k - 1)
  }

  test("q_graph_clustco equals neighbor-set pair counting") {
    val got = Analytics10.q_graph_clustco(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val edgeSet = pairs.toSet
    val want = nbrs.toSeq.filter(_._2.size >= 2).map { case (v, ns) =>
      val sorted = ns.toSeq.sorted
      val tri = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
        if edgeSet((sorted(i), sorted(j)))
      } yield 1).size.toLong
      val d = ns.size.toLong
      (v, d, tri, 20000L * tri / (d * (d - 1)))
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the corpus has both closed neighborhoods and open ones
    assert(want.exists(_._4 > 0) && want.exists(_._4 == 0))
  }

  test("clustcoOf: hand-derived cc on triangle+pendant, star and K4") {
    // triangle 1-2-3 with pendant 4 on node 1
    val tp = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("da", "db")
    val gotTp = Analytics10.clustcoOf(tp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotTp == Seq((1L, 3L, 1L, 3333L), (2L, 2L, 1L, 10000L),
      (3L, 2L, 1L, 10000L))) // node 4 (deg 1) out of domain
    // star: center has every wedge open
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("da", "db")
    val gotStar = Analytics10.clustcoOf(star).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(gotStar == Seq((1L, 0L)))
    // K4: everyone fully interconnected
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("da", "db")
    val gotK4 = Analytics10.clustcoOf(k4).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(gotK4 == Seq((1L, 10000L), (2L, 10000L), (3L, 10000L), (4L, 10000L)))
  }

  test("q_quality_buckets equals a plain-Scala histogram cut") {
    val got = Analytics10.q_quality_buckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val scored = docs.map { case (id, lang, text) =>
      val ws = text.split(" ", -1) // Spark split keeps trailing empties
      (id, lang, math.floor(10000.0 * ws.distinct.length / ws.length).toLong)
    }
    val want = scored.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val n = ds.size.toLong
      ds.map { case (id, _, s) =>
        val cLt = ds.count(_._3 < s).toLong
        val bucket = if (cLt * 3 >= n * 2) "head"
        else if (cLt * 3 >= n) "middle" else "tail"
        (id, lang, s, bucket)
      }
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: every bucket is inhabited in at least one language
    assert(Set("head", "middle", "tail").subsetOf(want.map(_._4).toSet))
  }

  test("bucketsOf: constant scores collapse to tail; two-point splits on the tie group") {
    // all-equal scores: c_lt = 0 for everyone → single 'tail' group
    val const = (1L to 9L).map(i => (i, "en", 5L)).toDF("doc_id", "lang", "score")
    val gotConst = Analytics10.bucketsOf(const).collect().map(_.getString(3)).toSet
    assert(gotConst == Set("tail"))
    // 10 low + 20 high: the 20-doc tie group sits at c_lt=10, 3·10 ≥ 30
    // but < 60 → whole group lands in 'middle' (never split across a cut)
    val two = ((1L to 10L).map(i => (i, "en", 1L)) ++
      (11L to 30L).map(i => (i, "en", 2L))).toDF("doc_id", "lang", "score")
    val gotTwo = Analytics10.bucketsOf(two).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert((1L to 10L).forall(gotTwo(_) == "tail"))
    assert((11L to 30L).forall(gotTwo(_) == "middle"))
  }

  test("q_funnel_latency equals plain-Scala funnel folds + order statistics") {
    val got = Analytics10.q_funnel_latency(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val durs = events.groupBy(e => (e._1, Math.floorDiv(e._2, DayUs)))
      .toSeq.flatMap { case ((_, day), rows) =>
        val tv = rows.filter(_._4 == "view").map(_._2).sorted.headOption
        val tc = tv.flatMap(v =>
          rows.filter(r => r._4 == "click" && r._2 > v).map(_._2).sorted.headOption)
        tc.map(c => (day, (c - tv.get) / 1000000L))
      }
    val want = durs.groupBy(_._1).toSeq.map { case (day, ds) =>
      val sorted = ds.map(_._2).sorted
      (java.time.LocalDate.ofEpochDay(day).toString, sorted.size.toLong,
        orderStat(sorted, 1, 2), orderStat(sorted, 9, 10), sorted.max)
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: p50 < p90 somewhere (the distribution has spread)
    assert(want.exists(d => d._3 < d._4))
  }

  test("q_ts_seasonal equals a plain-Scala BigInt weekday profile") {
    val got = Analytics10.q_ts_seasonal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9))).toSeq
    val withDow = events.map { e =>
      (e._1, (Math.floorDiv(e._2, DayUs) + 4) % 7, e._2, e._3, e._5)
    }
    val prof = withDow.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      k -> (BigInt(rows.size), rows.map(r => BigInt(r._5)).sum,
        rows.map(r => BigInt(r._5) * r._5).sum)
    }
    val want = withDow.map { case (u, dow, ts, eid, y) =>
      val (m, s1, s2) = prof((u, dow))
      val dev = m * y - s1
      val vn = m * s2 - s1 * s1
      (u, dow, ts, eid, y, m.toLong, s1.toLong, dev.toLong, vn.toLong,
        m >= 5 && dev * dev > 4 * vn)
    }.sortBy(t => (t._1, t._3, t._4))
    assert(got.nonEmpty && got.toSeq == want)
    assert(want.exists(_._10) && want.exists(!_._10))
  }

  test("q_ts_sax equals plain-Scala PAA over empirical quartiles") {
    val got = Analytics10.q_ts_sax(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = events.groupBy(_._1).toSeq.map { case (u, rows) =>
      val ys = rows.sortBy(r => (r._2, r._3)).map(_._5)
      val n = ys.size
      val sorted = ys.sorted
      val (q1, q2, q3) = (orderStat(sorted, 1, 4), orderStat(sorted, 1, 2),
        orderStat(sorted, 3, 4))
      val word = ys.zipWithIndex
        .groupBy { case (_, i) => i.toLong * 8 / n }
        .toSeq.sortBy(_._1)
        .map { case (_, seg) =>
          val s = seg.map(x => BigInt(x._1)).sum
          val c = BigInt(seg.size)
          if (s < q1 * c) "a" else if (s < q2 * c) "b"
          else if (s < q3 * c) "c" else "d"
        }.mkString
      (u, n.toLong, word)
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: words differ across hosts and use several letters
    assert(want.map(_._3).distinct.size > 1)
    assert(want.flatMap(_._3.toSeq).toSet.size >= 3)
  }

  test("saxOf: constant series is all-d; a linear ramp reads aabbccdd") {
    // constant: every segment mean equals every quartile → never strictly
    // below any breakpoint → 'd' across the board
    val const = (1L to 8L).map(i => (7L, i, i, 42L))
      .toDF("user_id", "ts_us", "event_id", "y")
    val gotConst = Analytics10.saxOf(const, segments = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(gotConst == Seq((7L, 8L, "dddddddd")))
    // ramp 1..16: quartiles 4/8/12, segment sums 3,7,11,15,19,23,27,31
    // against breakpoints 8/16/24 per 2-element segment
    val ramp = (1L to 16L).map(i => (9L, i, i, i))
      .toDF("user_id", "ts_us", "event_id", "y")
    val gotRamp = Analytics10.saxOf(ramp, segments = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(gotRamp == Seq((9L, 16L, "aabbccdd")))
  }
}
