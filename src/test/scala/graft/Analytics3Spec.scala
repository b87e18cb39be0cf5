package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-5 continuation battery's semantics on constructed data:
  * hand-computed sequence matches, brute-force window distinct, exact BFS
  * levels, and skyline == brute-force dominance. */
class Analytics3Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("q_seq_pattern: hand-computed match counts on constructed sequences") {
    // user 1: cvpcep -> 'cvp' matches; the second c is followed by e before
    // any p, so [^ep]* cannot reach it: exactly 1 conversion.
    // user 2: ccvp -> ONE non-overlapping match (greedy from the first c,
    //   the second c is consumed as part of [^ep]*? No: [^ep] excludes
    //   nothing about c — 'cvp' tail consumed from first match 'ccvp'.
    // user 3: no purchase at all -> 0.
    val rows = Seq(
      (1L, "cvpcep"), (2L, "ccvp"), (3L, "vvsce"),
    ).flatMap { case (u, s) =>
      s.zipWithIndex.map { case (ch, i) => (u, i.toLong * 1000L, i.toLong, ch.toString) }
    }
    val df = rows.toDF("user_id", "ts_us", "event_id", "code")
    val got = queries.Analytics3.seqPattern(df)
      .select("user_id", "seq_len", "n_conv").as[(Long, Int, Int)].collect()
      .map { case (u, l, c) => (u, (l, c)) }.toMap
    assert(got(1L) == ((6, 1)), s"user1: $got")
    assert(got(2L) == ((4, 1)), s"user2: $got")
    assert(got(3L) == ((5, 0)), s"user3: $got")
  }

  test("q_seq_pattern: conversions bounded by min(#clicks, #purchases)") {
    val df = queries.Analytics3.q_seq_pattern(spark, sf)
    val ev = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1).otherwise(0)).as("nc"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("np"),
        count(lit(1)).as("n"))
    val joined = df.join(ev, "user_id")
      .select(col("user_id"), col("n_conv"), least(col("nc"), col("np")).as("bound"),
        col("seq_len"), col("n")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getInt(1) <= r.getLong(2), s"n_conv exceeds click/purchase bound: $r")
      assert(r.getInt(3).toLong == r.getLong(4), s"seq_len != event count: $r")
    }
  }

  test("q_win_countd: matches a brute-force trailing-window distinct") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val want = rows.toSeq.flatMap { case (u, es) =>
      es.zipWithIndex.map { case (e, i) =>
        ((u, e._2), es.slice(math.max(0, i - 9), i + 1).map(_._4).distinct.size)
      }
    }.toMap
    val got = queries.Analytics3.q_win_countd(spark, sf)
      .as[(Long, Long, Int)].collect()
      .map { case (u, eid, n) => ((u, eid), n) }.toMap
    assert(got.size == want.size)
    want.foreach { case (k, n) => assert(got(k) == n, s"window distinct differs at $k") }
  }

  test("q_graph_bfs: exact levels on a constructed graph") {
    // path 1-2-3-4-5 plus an unreachable island 8-9; source = node 1
    // bfs symmetrizes internally — pass the raw directed pair list
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)).toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    val got = queries.Analytics3.bfs(e0, sources, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"BFS levels wrong: $got") // 5 is 4 hops away, 8/9 unreachable
  }

  test("q_graph_bfs: every dist-k node has a dist-(k-1) neighbor on real data") {
    val df = queries.Analytics3.q_graph_bfs(spark, sf).persist()
    val byDist = df.groupBy(col("dist")).count().as[(Long, Long)].collect().toMap
    assert(byDist.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(byDist.getOrElse(0L, 0L) > 0, "no source nodes")
    val e0 = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("src"), (col("l_suppkey") + 1000000000L).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    // parent check: each non-source reached node neighbors a node one level up
    val parents = df.filter(col("dist") > 0)
      .join(edges, df("id") === edges("dst"))
      .join(df.select(col("id").as("pid"), col("dist").as("pdist")),
        edges("src") === col("pid"))
      .groupBy(col("id"), col("dist")).agg(min(col("pdist")).as("best"))
    val bad = parents.filter(col("best") =!= col("dist") - 1).count()
    assert(bad == 0, s"$bad nodes lack a parent one level up")
    df.unpersist()
  }

  test("q_ts_ohlc: struct-argmax formulation equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .withColumn("bucket_us", expr("(ts_us div 3600000000) * 3600000000"))
    val w = Window.partitionBy(col("event_type"), col("bucket_us"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val want = ev
      .withColumn("open", first(col("value")).over(w))
      .withColumn("close", last(col("value")).over(w))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(first(col("open")).as("open"), max(col("value")).as("high"),
        min(col("value")).as("low"), first(col("close")).as("close"),
        count(lit(1)).as("n"))
    val got = queries.Analytics3.q_ts_ohlc(spark, sf)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "OHLC formulations diverge")
    // candle invariant: low <= open, close <= high
    val bad = got.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close")).count()
    assert(bad == 0, s"$bad candles violate low<=open,close<=high")
  }

  test("q_counter_rate: matches a driver-side recomputation with reset semantics") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val want = rows.toSeq.flatMap { case (u, es) =>
      es.sliding(2).collect { case Array(p, c) =>
        val reset = if (c._4 < p._4) 1 else 0
        val basis = if (reset == 1) c._4 else c._4 - p._4
        val rate = if (c._3 > p._3)
          Some(math.floor(10000.0 * basis / ((c._3 - p._3) / 1000000.0)).toLong)
        else None
        ((u, c._2), (reset, rate))
      }
    }.toMap
    val got = queries.Analytics3.q_counter_rate(spark, sf)
      .as[(Long, Long, Long, Int, Option[Long])].collect()
      .map { case (u, eid, _, r, bp) => ((u, eid), (r, bp)) }.toMap
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"rate differs at $k") }
  }

  test("q_skyline: equals brute-force dominance filter; mutual non-dominance") {
    val pts = Tables.part(spark, sf)
      .select(col("p_brand").as("g"),
        (queries.Q.dec2(col("p_retailprice")) * 100).cast("long").as("x"),
        col("p_size").cast("long").as("y")).distinct().persist()
    val a = pts.select(col("g").as("ag"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("g").as("bg"), col("x").as("bx"), col("y").as("by"))
    val dominated = a.join(b,
      col("bg") === col("ag") && col("bx") <= col("ax") && col("by") <= col("ay") &&
        (col("bx") < col("ax") || col("by") < col("ay")), "left_semi")
    val want = pts.except(dominated
      .select(col("ag").as("g"), col("ax").as("x"), col("ay").as("y")))
      .as[(String, Long, Long)].collect().toSet
    val got = queries.Analytics3.skyline(pts).as[(String, Long, Long)].collect()
    assert(got.toSet == want, s"skyline != brute force (got ${got.length}, want ${want.size})")
    // within a group, no skyline point dominates another
    got.groupBy(_._1).values.foreach { grp =>
      grp.foreach { p => grp.foreach { q =>
        assert(p == q || !(q._2 <= p._2 && q._3 <= p._3 && (q._2 < p._2 || q._3 < p._3)),
          s"$q dominates $p inside the skyline")
      }}
    }
    pts.unpersist()
  }
}
