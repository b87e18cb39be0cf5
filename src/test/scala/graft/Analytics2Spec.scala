package graft

import graft.queries.Analytics2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts for the round-5 battery, beyond the DuckDB hash gate:
  * compaction formulation equivalence (agg-argmax == window-rank),
  * exactly-once spatial pair emission vs a brute-force cross join, the
  * dupline reconstruction invariant (untouched docs rebuild to their exact
  * original text), attribution window bounds, basket-count consistency and
  * SQ8 code-range/shortlist invariants. Runs on sf0.001. */
class Analytics2Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("q_cdc_compact: map-combinable argmax equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = Analytics2.q_cdc_compact(spark, sf).collect().toSeq
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val want = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rk") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"), col("ts_us").as("last_ts_us"), col("n_ops"))
      .orderBy(col("user_id"))
      .collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("q_join_spatial: grid join emits exactly the brute-force pair set") {
    val got = Analytics2.q_join_spatial(spark, sf)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").getItem(0).cast("double").as("x"),
        col("embedding").getItem(1).cast("double").as("y"))
    val a = pts.select(col("vec_id").as("a_id"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("vec_id").as("b_id"), col("x").as("bx"), col("y").as("by"))
    val want = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <= lit(0.03 * 0.03))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty && got.sorted == want.sorted)
    assert(got.distinct.size == got.size, "pair emitted more than once")
  }

  test("q_text_dupline: fully-kept docs reconstruct to their original text") {
    val out = Analytics2.q_text_dupline(spark, sf)
    val joined = out.join(Tables.documents(spark, sf), "doc_id")
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        col("clean_md5"), md5(col("text")).as("orig_md5"))
      .collect()
    assert(joined.nonEmpty)
    var full = 0
    joined.foreach { r =>
      val (nc, nk) = (r.getLong(1), r.getLong(2))
      assert(nk <= nc, s"doc ${r.getLong(0)}: kept $nk > chunks $nc")
      if (nk == nc) {
        // concat of ALL 3-word chunks joined by ' ' is the original text,
        // so an untouched doc's clean_md5 must equal md5(text) exactly
        assert(r.getString(3) == r.getString(4), s"doc ${r.getLong(0)} reconstruction drifted")
        full += 1
      }
    }
    assert(full > 0, "fixture has no fully-kept doc — reconstruction untested")
    assert(joined.exists(r => r.getLong(2) < r.getLong(1)),
      "fixture drops no chunk anywhere — df threshold untested")
  }

  test("q_attribution: attributed purchases have gaps inside the 7-day window") {
    val rows = Analytics2.q_attribution(spark, sf)
      .select("attributed", "gap_us").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getInt(0) == 1) {
        val g = r.getLong(1)
        assert(g >= 0L && g <= 604800000000L, s"gap $g outside window")
      } else assert(r.isNullAt(1), "organic purchase carries a gap")
    }
    assert(rows.exists(_.getInt(0) == 1) && rows.exists(_.getInt(0) == 0),
      "fixture exercises only one attribution branch")
  }

  test("q_freq_pairs: pair support never exceeds either marginal") {
    val rows = Analytics2.q_freq_pairs(spark, sf)
      .select("ta", "tb", "n_ab", "n_a", "n_b").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "unordered pair emitted")
      val (ab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ab <= na && ab <= nb, s"support $ab exceeds a marginal ($na, $nb)")
    }
  }

  test("q_ann_sq8: codes stay in [0,255] and every query gets a full shortlist") {
    val out = Analytics2.q_ann_sq8(spark, sf).collect()
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3), s"query $q shortlist incomplete")
    }
    // 64 dims × 255² is the integer-dot ceiling for byte codes
    out.foreach { r =>
      val d = r.getLong(2)
      assert(d >= 0L && d <= 64L * 255 * 255, s"idot $d out of byte-code range")
    }
  }

  test("q_text_winnow: docs sharing a >=12-char substring share a fingerprint hash") {
    // Schleimer et al.'s guarantee: a common substring of length >= k+w-1
    // (= 12 here) forces at least one common selected hash
    val shared = "XXSHAREDRUNYY" // 13 chars
    val docs = Seq(
      (1L, "abcdefghijklmnop" + shared + "qrstuvwx"),
      (2L, "zzzzyyyyxxxxwwww2222" + shared + "0000"),
      (3L, "entirely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val fp = queries.Analytics2.winnowFingerprints(docs)
      .select(col("doc_id"), expr("sel div 1048576").as("h"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty, "shared substring produced no shared fingerprint")
    // determinism: identical text => identical hash set regardless of doc_id
    val dup = Seq((7L, docs.head.getString(1)), (8L, docs.head.getString(1))).toDF("doc_id", "text")
    val dupFp = queries.Analytics2.winnowFingerprints(dup)
      .select(col("doc_id"), expr("sel div 1048576").as("h"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(dupFp(7L) == dupFp(8L))
  }

  test("q_tpch_q3: dim filters broadcast into the fact join") {
    val df = queries.Analytics2.q_tpch_q3(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected both dim joins broadcast:\n$plan")
    assert(plan.contains("PushedFilters"), "no filter pushdown in the scan")
  }
}
