package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinSketch

/** Unit pins for the Count-Min sketch aggregate: the ≥-true-count bound,
  * exactness in the collision-free regime, merge ≡ reduce (the map-side
  * combine contract), buffer-size independence from row count, and a
  * distributed differential against exact groupBy counts. */
class CmsSpec extends AnyFunSuite with SparkFixture {

  private val W = 1024
  private val D = 4

  private def sketchOf(keys: Seq[Long]): Array[Long] = {
    val agg = new CountMinSketch(W, D, Nil)
    keys.foldLeft(agg.zero)(agg.reduce)
  }

  test("estimate never undercounts, and is exact on a sparse key domain") {
    val keys = (0L until 50L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k))
    val m = sketchOf(keys)
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, n) =>
      val est = CountMinSketch.estimate(m, k, W, D)
      assert(est >= n, s"CMS undercounted key $k: $est < $n")
    }
    // 50 keys in 4 rows of 1024 slots: P(any key collides in all rows)
    // ≈ 50·(50/1024)⁴ ≈ 3·10⁻⁴ — and the hashes are fixed, so this
    // assertion is deterministic, not flaky.
    truth.foreach { case (k, n) =>
      assert(CountMinSketch.estimate(m, k, W, D) == n)
    }
  }

  test("an absent key estimates 0 when its slots are clean") {
    val m = sketchOf(Seq(1L, 2L, 3L))
    assert(CountMinSketch.estimate(m, 999983L, W, D) == 0L)
  }

  test("merge of split halves equals reduce of the whole") {
    val agg = new CountMinSketch(W, D, Nil)
    val keys = (0L until 400L).map(k => k % 37)
    val (a, b) = keys.splitAt(173)
    val merged = agg.merge(sketchOf(a), sketchOf(b))
    assert(merged.toSeq == sketchOf(keys).toSeq,
      "element-wise merge must equal single-pass reduce")
  }

  test("buffer size is fixed regardless of row count") {
    assert(sketchOf(Seq(1L)).length == D * W)
    assert(sketchOf((0L until 5000L)).length == D * W)
  }

  test("the hash family rows are pairwise distinct functions") {
    val collisionsAcrossRows = (0L until 1000L).count { k =>
      CountMinSketch.slot(k, 0, W) == CountMinSketch.slot(k, 1, W)
    }
    // independent hashes would collide ~1000/1024 times by chance; identical
    // rows would collide 1000 times — this separates the two regimes
    assert(collisionsAcrossRows < 20)
  }

  test("distributed probe estimates match exact counts on real data") {
    val got = queries.Analytics7.q_agg_cms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id") < 10)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
