package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the constraint-audit, map-side-bucketizer, and vocabulary-build
  * semantics: audit counters equal independently computed filters (and the
  * known-bad uniqueness constraint actually reports), bucketize matches the
  * exact ntile partition wherever the boundary definitions agree and is
  * equi-depth within ±1 off-boundary, vocab ids are a contiguous frequency
  * ranking consistent with a brute-force recount. */
class Analytics5Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("q_quality_audit: counters equal independent recomputation; known-bad check reports") {
    val got = queries.Analytics5.q_quality_audit(spark, sf)
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    assert(got.keySet == Set("fk_orderkey_exists", "l_discount_in_0_1",
      "l_quantity_in_1_50", "l_shipdate_not_null", "pk_orderkey_linenumber_unique"))
    got.values.foreach { case (checked, _, _) => assert(checked == n) }
    val dupViol = n - li.select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(got("pk_orderkey_linenumber_unique") == ((n, dupViol, if (dupViol == 0) 1 else 0)))
    // FIXTURES: (l_orderkey, l_linenumber) has substantial dup keys — the
    // audit must FAIL this constraint, proving it reports rather than
    // rubber-stamps.
    assert(dupViol > 0 && got("pk_orderkey_linenumber_unique")._3 == 0)
    val qtyViol = li.filter(col("l_quantity").isNull ||
      col("l_quantity") < 1.0 || col("l_quantity") > 50.0).count()
    assert(got("l_quantity_in_1_50")._2 == qtyViol)
    assert(got("l_shipdate_not_null")._2 ==
      li.filter(col("l_shipdate").isNull).count())
    // every lineitem key exists in orders in this data
    assert(got("fk_orderkey_exists") == ((n, 0L, 1)))
  }

  test("q_bucketize: equi-depth within one row per group; monotone in value") {
    val df = queries.Analytics5.q_bucketize(spark, sf).persist()
    val sizes = df.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    assert(sizes.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    // rank-⌊kn/4⌋ boundaries give bucket sizes within 1 of n/4, up to
    // value ties at a boundary (the strict > rule keeps ties low)
    val maxDup = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("c"))
      .groupBy(col("event_type")).agg(max(col("c")).as("m"))
      .as[(String, Long)].collect().toMap
    sizes.groupBy(_._1).foreach { case (t, rs) =>
      val total = rs.map(_._3).sum.toDouble
      rs.foreach { case (_, b, c) =>
        assert(math.abs(c - total / 4) <= maxDup(t).toDouble,
          s"$t bucket $b size $c of $total")
      }
    }
    // buckets are monotone in value: the max value in bucket k never
    // exceeds the min value in bucket k+1 (ties at boundaries excluded
    // by the strict > assignment rule)
    val stats = df.join(
        Tables.events(spark, sf).select(col("event_id"), col("value")), Seq("event_id"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .as[(String, Long, Double, Double)].collect()
      .groupBy(_._1)
    stats.foreach { case (t, rs) =>
      val byB = rs.sortBy(_._2)
      byB.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._3, s"$t: bucket ${a._2} hi ${a._4} > bucket ${b._2} lo ${b._3}")
        case _ =>
      }
    }
    df.unpersist()
  }

  test("bucketize degenerate cases: NULL low boundaries, 1-row group drops, NULL value in bucket 1") {
    val ev = Seq[(String, Long, Option[Double])](
      ("one", 0L, Some(9.0)),
      ("tiny", 1L, Some(5.0)), ("tiny", 2L, Some(6.0)), ("tiny", 3L, Some(7.0)),
      ("big", 10L, Some(1.0)), ("big", 11L, Some(2.0)), ("big", 12L, Some(3.0)),
      ("big", 13L, Some(4.0)), ("big", 14L, None))
      .toDF("event_type", "event_id", "value")
    val got = queries.Analytics5.bucketize(ev)
      .as[(String, Long, Long)].collect().sortBy(_._2)
    val byId = got.map(r => r._2 -> r._3).toMap
    // n=1: every boundary rank is 0 — the group drops on both engines
    assert(!byId.contains(0L), s"1-row group leaked: ${got.toSeq}")
    // n=3: b1's rank is 0 ⇒ b1 = NULL, which when() treats as not-crossed;
    // b2 = value@1 = 5.0, b3 = value@2 = 6.0 ⇒ buckets 1, 2, 3
    assert(byId(1L) == 1L && byId(2L) == 2L && byId(3L) == 3L, s"got ${got.toSeq}")
    // n=5 with NULLS LAST pinned: ranks 1,2,3,4,NULL; b=(1.0, 2.0, 3.0);
    // the NULL value compares NULL everywhere and lands in bucket 1
    assert(byId(10L) == 1L && byId(11L) == 2L && byId(12L) == 3L &&
      byId(13L) == 4L && byId(14L) == 1L, s"got ${got.toSeq}")
  }

  test("q_join_incremental: delta-form merge equals the direct join, bit-exact") {
    val got = queries.Analytics5.q_join_incremental(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val direct = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"))
          .cast("double").as("rev"))
      .orderBy(col("o_orderpriority"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got == direct) // incl. bit-equal doubles: decimal sums commute
    assert(got.map(_._2).sum == l.join(o, col("o_orderkey") === col("l_orderkey")).count())
  }

  test("q_json_variant: variant extraction equals the string-path recount; absent path is NULL") {
    val got = queries.Analytics5.q_json_variant(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val want = Tables.events(spark, sf)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    got.foreach { case (t, kSum, kMax, nAbsent, n) =>
      assert((kSum, kMax, n) == ((want(t)._2, want(t)._3, want(t)._4)), s"type $t")
      assert(nAbsent == 0L, "try_variant_get of a missing path must be NULL")
    }
    // malformed documents null out instead of failing the job
    val dirty = Seq("""{"k": 7}""", """not json at all""", """{"k": """)
      .toDF("props")
      .selectExpr("try_variant_get(try_parse_json(props), '$.k', 'bigint') AS k")
      .as[Option[Long]].collect()
    assert(dirty.toSeq == Seq(Some(7L), None, None))
  }

  test("q_seq_pack: full examples hold exactly 512 tokens; spans partition each doc") {
    val got = queries.Analytics5.q_seq_pack(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.nonEmpty)
    val lastEx = got.map(_._1).max
    // every example but the last is exactly full
    got.groupBy(_._1).foreach { case (ex, rs) =>
      val tot = rs.map(_._3).sum
      if (ex < lastEx) assert(tot == 512L, s"example $ex holds $tot tokens")
      else assert(tot >= 1L && tot <= 512L)
    }
    // per doc: spans partition ntok, exactly one head span
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"), greatest(expr("n_chars div 4"), lit(1L)).as("ntok"))
      .as[(Long, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (d, rs) =>
      assert(rs.map(_._3).sum == ntok(d), s"doc $d spans != ntok")
      assert(rs.count(_._4 == 1) == 1, s"doc $d head count")
      // spans cover consecutive examples
      val exs = rs.map(_._1).sorted
      assert(exs.zip(exs.tail).forall { case (a, b) => b == a + 1 }, s"doc $d gaps")
    }
    assert(got.count(_._4 == 1) == ntok.size)
  }

  test("q_str_collate: collated distinct equals lower() recount, binary >= ci") {
    val got = queries.Analytics5.q_str_collate(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val want = Tables.events(spark, sf)
      .select(col("user_id"),
        when(col("event_id") % 2 === 0, upper(col("event_type")))
          .otherwise(col("event_type")).as("t"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("t")).as("nb"), countDistinct(lower(col("t"))).as("nc"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (u, nb, nc) =>
      assert((nb, nc) == want(u), s"user $u")
      assert(nb >= nc && nc >= 1, s"user $u: binary $nb < ci $nc")
    }
    // the synthesis actually produces case variants somewhere
    assert(got.exists { case (_, nb, nc) => nb > nc })
  }

  test("q_vocab_topk: contiguous ids ranked by an independent frequency recount") {
    val got = queries.Analytics5.q_vocab_topk(spark, sf)
      .as[(Long, String, Long)].collect()
    val counts = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // the synthetic corpus vocabulary is tiny at small SF — the cap only
    // bites when the vocabulary exceeds it
    assert(got.length == math.min(200, counts.size) && got.nonEmpty)
    assert(got.map(_._1).toSeq == (1L to got.length.toLong))
    got.foreach { case (_, w, n) => assert(counts(w) == n, s"word $w") }
    // ids follow (n DESC, word ASC) total order
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"$a !< $b")
      case _ =>
    }
    // nothing outside the returned set beats the last entry
    val cutoff = got.last
    val better = counts.count { case (w, n) =>
      n > cutoff._3 || (n == cutoff._3 && w < cutoff._2)
    }
    assert(better == got.length - 1,
      s"expected exactly ${got.length - 1} entries strictly above the cutoff, got $better")
  }
}
