package graft

import org.apache.spark.sql.expressions.Window
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

  test("checksumDiff: identity diff is all-same; a dropped row flips exactly its bucket") {
    val rows = (1L to 400L).map(i => Tuple1(s"row-$i")).toSeq.toDF("k")
    val idCol = col("k")
    val same = queries.Analytics4.checksumDiff(rows, rows, idCol, buckets = 32)
      .as[(Long, Long, Long, Int)].collect()
    assert(same.nonEmpty && same.forall(_._4 == 1), s"identity diff not all-same")
    assert(same.map(_._2).sum == 400L, "identity diff lost rows")
    val dropped = rows.filter(col("k") =!= "row-17")
    val diff = queries.Analytics4.checksumDiff(rows, dropped, idCol, buckets = 32)
      .as[(Long, Long, Long, Int)].collect()
    val bad = diff.filter(_._4 == 0)
    assert(bad.length == 1, s"expected exactly 1 drifted bucket, got ${bad.toList}")
    assert(bad.head._2 - bad.head._3 == 1L, s"drifted bucket delta wrong: ${bad.head}")
  }

  test("q_table_diff: drifted buckets account exactly for the simulated drop") {
    val df = queries.Analytics4.q_table_diff(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val nDropped = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 997 === 0 && col("l_linenumber") === 1).count()
    val delta = df.map(r => r._2 - r._3).sum
    assert(delta == nDropped, s"bucket deltas $delta != dropped rows $nDropped")
    df.filter(_._4 == 1).foreach { r =>
      assert(r._2 == r._3, s"same bucket with unequal counts: $r")
    }
    assert(df.filter(_._4 == 0).forall(r => r._2 != r._3 || r._2 > 0),
      "drift flagged on an empty bucket")
  }

  test("q_global_rownum: equals the naive global-window rank, contiguous 1..N") {
    val df = queries.Analytics4.q_global_rownum(spark, sf)
      .withColumnRenamed("rn", "rn_fast")
    val naive = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("rn_naive",
        row_number().over(Window.orderBy(col("ts_us"), col("event_id"))).cast("long"))
    val joined = df.join(naive, Seq("ts_us", "event_id"))
    assert(joined.filter(col("rn_fast") =!= col("rn_naive")).count() == 0,
      "two-phase numbering diverges from the global window")
    val n = df.count()
    assert(df.agg(min(col("rn_fast")), max(col("rn_fast"))).as[(Long, Long)].head() == ((1L, n)),
      s"rn not contiguous 1..$n")
    assert(df.select(col("rn_fast")).distinct().count() == n, "rn has duplicates")
  }

  test("q_text_chunk: matches a driver-side recomputation (windows, stride, fingerprints)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val got = queries.Analytics4.q_text_chunk(spark, sf)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => (r._2, r._3, r._4)).sortBy(_._1).toVector }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(docs.nonEmpty && got.keySet == docs.keySet)
    docs.foreach { case (d, text) =>
      val ws = text.split(" ", -1)
      val expect = (0 to math.max(ws.length - 1, 0) by 25).map { st =>
        val chunk = ws.slice(st, st + 50)
        ((st / 25 + 1).toLong, chunk.length.toLong, md5hex(chunk.mkString(" ")))
      }
      assert(got(d) == expect, s"doc $d: got ${got(d).take(3)}... want ${expect.take(3)}...")
    }
    // overlap invariant: consecutive full chunks share stride words
    got.values.flatten.foreach { case (_, n, _) => assert(n >= 1 && n <= 50) }
  }

  test("q_win_ntile: SQL-standard bucket sizes, tiles monotone in the order key") {
    val df = queries.Analytics4.q_win_ntile(spark, sf)
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(r => (r._3, r._2)) }
    val got = df.as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => r._2 -> r._3).toMap }
    assert(vals.keySet == got.keySet)
    vals.foreach { case (g, sortedRows) =>
      val n = sortedRows.length; val k = 4
      val big = n % k; val small = n / k
      sortedRows.zipWithIndex.foreach { case ((_, id, _), i) =>
        // SQL-standard ntile: the first n mod k buckets hold one extra row
        val expect = if (i < big * (small + 1)) i / (small + 1) + 1
                     else big + (i - big * (small + 1)) / small + 1
        assert(got(g)(id) == expect.toLong, s"group $g row $i: got ${got(g)(id)}, want $expect")
      }
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
