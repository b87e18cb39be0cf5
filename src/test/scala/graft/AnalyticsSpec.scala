package graft

import graft.queries.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts for the round-4 analytics battery, beyond the DuckDB
  * hash gate: median parity cases, exactly-once interval-pair emission vs
  * a brute-force cross join, bitmap==exact distinct, SCD-2 interval
  * chaining, and the sessionization gap invariant. Runs on sf0.001. */
class AnalyticsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("q_win_median: explicit middle-element formula matches a local sort") {
    val rows = Analytics.q_win_median(spark, sf)
      .select("user_id", "event_id", "n", "med")
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    // recompute per-user frames locally from the source ordering
    val src = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // event_ids are unique per user in this data (ordering ties broken by
    // event_id), so frame membership is reproducible
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    for ((u, evs) <- src; i <- evs.indices) {
      val frame = evs.slice(math.max(0, i - 4), i + 1).map(_._3).sorted
      val n = frame.length
      val want =
        if (n % 2 == 1) frame(n / 2)
        else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
      val got = byKey((u, evs(i)._2))
      assert(got._3 == n && got._4 == want,
        s"user=$u event=${evs(i)._2}: got $got want ($n, $want)")
    }
  }

  test("q_join_interval: bucketed counts equal the brute-force cross join") {
    val got = Analytics.q_join_interval(spark, sf)
      .as[(Long, Long)].collect().toMap
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate")).as("os"))
    val l = Tables.lineitem(spark, sf)
      .select(unix_micros(col("l_shipdate")).as("ls"))
    val want = o.crossJoin(l)
      .filter(col("ls") < col("os") + lit(604800000000L) &&
        col("os") < col("ls") + lit(259200000000L))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("q_agg_bitmap: bitmap popcount sum equals exact count distinct") {
    val got = Analytics.q_agg_bitmap(spark, sf).as[(String, Long)].collect().toMap
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("q_scd2: versions are contiguous and validity intervals chain") {
    val rows = Analytics.q_scd2(spark, sf)
      .select("user_id", "version", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Int, Long, Option[Long], Int)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    for ((u, vs0) <- rows) {
      val vs = vs0.sortBy(_._2)
      assert(vs.map(_._2).toSeq == (1 to vs.length), s"user $u versions not contiguous")
      for (Array(a, b) <- vs.sliding(2).map(_.toArray) if vs.length > 1) {
        assert(a._4.contains(b._3), s"user $u: valid_to of v${a._2} != valid_from of v${b._2}")
        assert(a._5 == 0)
      }
      assert(vs.last._4.isEmpty && vs.last._5 == 1, s"user $u current row open-ended")
    }
  }

  test("q_sessionize: >30min gaps split sessions, never inside one") {
    val sess = Analytics.q_sessionize(spark, sf)
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    val gap = 1800000000L
    for ((u, ss0) <- sess) {
      val ss = ss0.sortBy(_._2)
      // inter-session gap strictly greater than the threshold
      for (Array(a, b) <- ss.sliding(2).map(_.toArray) if ss.length > 1)
        assert(b._4 - a._5 > gap, s"user $u: sessions ${a._2},${b._2} should have merged")
      // event count conservation per user
      val total = ss.map(_._3).sum
      val nEvents = Tables.events(spark, sf).filter(col("user_id") === u).count()
      assert(total == nEvents, s"user $u: session events $total != $nEvents")
    }
  }

  test("q_topk_approx ranking is exact at the tracked>=domain boundary") {
    val got = Analytics.q_topk_approx(spark, sf)
      .select("event_type", "n").as[(String, Long)].collect().toSeq
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))
      .as[(String, Long)].collect().take(3).toSeq
    assert(got == want)
  }

  test("q_text_boilerplate shingle df never exceeds the doc count") {
    val nDocs = Tables.documents(spark, sf).count()
    val rows = Analytics.q_text_boilerplate(spark, sf).as[(String, Long)].collect()
    assert(rows.forall(r => r._2 >= 20 && r._2 <= nDocs))
  }
}
