package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the typed-cogroup merge and PPS-sampling semantics: cogroup counts
  * equal a brute-force pair join (constructed AND real data), absent-side
  * keys emit zeros, and the systematic-PPS selection hits every stride
  * boundary exactly once with per-group counts in the guaranteed band. */
class Analytics4Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("q_cogroup_pairs: merge counts == brute-force join on constructed data") {
    // key 1: purchases at 100, 200; clicks at 95, 150, 199, 201 (window 50)
    //   p=100 -> clicks in [50,100] = {95} -> 1
    //   p=200 -> clicks in [150,200] = {150, 199} -> 2 ; pairs=3, hit=2
    // key 2: purchase at 10, no clicks -> 0 pairs
    // key 3: clicks only -> row with n_purch=0
    val l = Seq((1L, 100L), (1L, 200L), (2L, 10L)).toDS()
    val r = Seq((1L, 95L), (1L, 150L), (1L, 199L), (1L, 201L), (3L, 7L)).toDS()
    val got = queries.Analytics4.cogroupPairs(spark, l, r, windowUs = 50L)
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 2L, 4L, 3L, 2L)), s"key1: $got")
    assert(got(2L) == ((2L, 1L, 0L, 0L, 0L)), s"key2: $got")
    assert(got(3L) == ((3L, 0L, 1L, 0L, 0L)), s"key3: $got")
  }

  test("q_cogroup_pairs: equals the materialized q_join_range-style pair join") {
    val df = queries.Analytics4.q_cogroup_pairs(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_us").as("cts"))
    val pairs = p.join(c, col("user_id") === col("cu") &&
        col("cts").between(col("ts_us") - 1800000000L, col("ts_us")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
    val joined = df.join(pairs, Seq("user_id"), "left")
      .select(col("user_id"), df("n_pairs"), coalesce(pairs("n_pairs"), lit(0L)))
      .as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (u, merged, brute) =>
      assert(merged == brute, s"user $u: cogroup=$merged join=$brute")
    }
  }

  test("q_sample_weighted: matches a driver-side recomputation of the stride rule") {
    val df = queries.Analytics4.q_sample_weighted(spark, sf)
    val got = df.select(col("lang"), col("doc_id"), col("cum"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => (r._2, r._3)).toSet }
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => (r._2, r._3)).sortBy(_._1) }
    assert(docs.nonEmpty && got.keySet.subsetOf(docs.keySet))
    docs.foreach { case (g, rows) =>
      val total = rows.map(_._2).sum
      val s = math.max(total / 20, 1L)
      var cum = 0L
      val expect = rows.flatMap { case (id, w) =>
        val prev = cum; cum += w
        if (cum / s > prev / s) Some((id, cum)) else None
      }.toSet
      assert(got.getOrElse(g, Set.empty) == expect,
        s"group $g: got ${got.getOrElse(g, Set.empty).size}, expected ${expect.size}")
    }
    // Selection probability is proportional to weight: selected docs must be
    // heavier on average than the corpus (sanity, not a distribution test).
    val selAvg = df.agg(avg(col("n_chars"))).as[Double].head()
    val allAvg = Tables.documents(spark, sf).agg(avg(col("n_chars"))).as[Double].head()
    assert(selAvg > allAvg, s"PPS should favor heavy docs: sel=$selAvg all=$allAvg")
  }
}
