package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-7 analytics additions ([[graft.queries.Analytics6]])
  * against independent driver-side recomputations on sf0.001 — exact
  * integer disciplines make full equality checks cheap. */
class Analytics6Spec extends AnyFunSuite with SparkFixture {

  test("q_text_lm_score: matches a full driver-side bigram-LM recomputation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // the shared split convention: lower, split on single space, drop empties
    val bigrams = docs.toSeq.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      ws.iterator.zip(ws.iterator.drop(1)).map(p => (id, p._1, p._2)).toSeq
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map(b => 10000L * c2((b._2, b._3)) / c1(b._2))
      (id, bs.size.toLong, terms.sum, terms.sum / bs.size)
    }.toSet
    val got = SparkEntry.queries("q_text_lm_score")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._4 <= 10000L),
      "an average conditional probability cannot exceed 1 (10000 bp)")
  }

  test("q_join_pointintime: every purchase matches exactly the version valid at its timestamp") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, String, Long)].collect().toSeq
    // driver-side SCD2: per user, change rows in (ts, event_id) order
    val dim = ev.groupBy(_._1).flatMap { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val changes = ordered.headOption.toSeq ++
        ordered.sliding(2).collect { case Seq(a, b) if a._3 != b._3 => b }
      changes.zipWithIndex.map { case (c, i) =>
        val validTo = changes.lift(i + 1).map(_._4)
        (user, i + 1, c._3, c._4, validTo)
      }
    }.toSeq
    val expected = ev.filter(_._3 == "purchase").map { case (user, eid, _, ts) =>
      val v = dim.filter(d => d._1 == user && d._4 <= ts &&
        d._5.forall(ts < _))
      assert(v.size == 1, s"purchase $eid matched ${v.size} versions")
      (eid, user, ts, v.head._2, v.head._3)
    }.toSet
    val got = SparkEntry.queries("q_join_pointintime")(spark, sf)
      .as[(Long, Long, Long, Int, String)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)) ==
      expected.map(e => (e._1, e._2, e._3, e._4, e._5)))
    assert(got.size == ev.count(_._3 == "purchase"),
      "point-in-time must yield exactly one row per fact")
  }

  test("q_index_posting: matches a full driver-side index recomputation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val terms = docs.toSeq.flatMap { case (id, text) =>
      text.toLowerCase.split(" ", -1).filter(_.nonEmpty).map(w => (w, id))
    }
    val expected = terms.groupBy(_._1).map { case (w, occ) =>
      val ids = occ.map(_._2).distinct.sorted
      val gaps = ids.sliding(2).collect { case Seq(a, b) => b - a }.toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (w, ids.size.toLong, occ.size.toLong, ids.head, ids.last, md,
        if (gaps.isEmpty) 0L else gaps.max)
    }.toSet
    val got = SparkEntry.queries("q_index_posting")(spark, sf)
      .as[(String, Long, Long, Long, Long, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("q_agg_decay: matches an exact BIGINT driver-side recomputation") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("ts_us"))
      .as[(String, Double, Long)].collect().toSeq
    val tMax = ev.map(_._3).max
    val terms = ev.flatMap { case (tpe, v, ts) =>
      val d = (tMax - ts) / 86400000000L
      if (d <= 20)
        Some((tpe, math.floor(v * 100).toLong * (1L << (20 - d).toInt)))
      else None
    }
    val expected = terms.groupBy(_._1).map { case (tpe, rows) =>
      val s = rows.map(_._2).sum
      (tpe, rows.size.toLong, s, s / 104857600.0)
    }.toSet
    val got = SparkEntry.queries("q_agg_decay")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expected)
    // the scaled sums must stay exactly representable in a double
    assert(got.forall(g => g._3 < (1L << 52)), "term sum left the exact-double range")
  }
}
