package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 4×16-bit chunk banding of [[graft.operators.SimHashDedup]] on
  * CONSTRUCTED signatures — deterministic hamming distances no generated
  * corpus can plant: recall at exactly the ≤3 band edge (3 flips spread
  * over 3 chunks leaves exactly one equal chunk — the pigeonhole
  * boundary), exclusion at 4 (spread: no candidate at all; packed into
  * one chunk: candidate generated, then filtered), and the exact
  * hamming values on every surviving pair. */
class SimHashBandSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("chunk banding: recall-complete at hamming <= 3, exclusion at 4") {
    val base = 0x0123456789abcdefL
    val sigs = Seq(
      0L -> base,
      1L -> (base ^ 1L), // 1 flip
      2L -> (base ^ (1L << 0) ^ (1L << 16) ^ (1L << 32)), // 3 flips, 3 chunks
      3L -> (base ^ (1L << 0) ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)), // 4 flips, ALL chunks
      4L -> (base ^ 0xfL) // 4 flips, ONE chunk (candidate, then filtered)
    ).toDF("doc_id", "simhash")
    val got = graft.operators.SimHashDedup
      .pairsFromSignatures(sigs, "doc_id", "simhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (0L, 1L, 1L), (0L, 2L, 3L), (1L, 2L, 2L),
      (1L, 3L, 3L), (1L, 4L, 3L), (2L, 3L, 1L))
    assert(got == want, s"got $got")
  }

  test("the wider-band refusal is loud") {
    val sigs = Seq((0L, 1L)).toDF("doc_id", "simhash")
    intercept[IllegalArgumentException] {
      graft.operators.SimHashDedup
        .pairsFromSignatures(sigs, "doc_id", "simhash", maxHamming = 4)
    }
  }

  test("planted-twin corpus: exactly the 1000 arithmetic pairs, all hamming 0") {
    val df = graft.queries.LlmExt
      .q_dedup_simhash_planted(spark, "/root/testdata/sf0.001")
      .collect()
    assert(df.length == 1000, s"got ${df.length} pairs")
    assert(df.forall(r => r.getLong(0) % 20 == 0 &&
      r.getLong(1) == r.getLong(0) + 1 && r.getLong(2) == 0L),
      "planted pairs must be (20r, 20r+1) with bit-identical signatures")
  }
}
