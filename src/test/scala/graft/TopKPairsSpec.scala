package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKPairs

/** Unit pins for the bounded-state top-k aggregate: buffer invariants
  * (size bound, order, tie direction), merge/reduce agreement, and a
  * differential against the window-rank form on real data. */
class TopKPairsSpec extends AnyFunSuite with SparkFixture {

  private val agg = new TopKPairs(3)

  private def reduceAll(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps at most k pairs in (ord desc, id asc) order") {
    val got = reduceAll(Seq((5L, 1L), (9L, 2L), (1L, 3L), (7L, 4L), (8L, 5L)))
    assert(got == Seq((9L, 2L), (8L, 5L), (7L, 4L)))
  }

  test("a full buffer ignores entries no better than its worst") {
    val full = reduceAll(Seq((9L, 1L), (8L, 2L), (7L, 3L)))
    assert(agg.reduce(full, (7L, 9L)) == full,  // ties on ord, larger id: worse
      "equal-ord larger-id entry must not displace the current worst")
    assert(agg.reduce(full, (6L, 0L)) == full)
  }

  test("ties on ord resolve to the smaller id, even mid-buffer") {
    val got = reduceAll(Seq((9L, 5L), (9L, 2L), (9L, 7L), (9L, 1L)))
    assert(got == Seq((9L, 1L), (9L, 2L), (9L, 5L)))
  }

  test("merge equals sequential reduce and truncates at k") {
    val xs = Seq((5L, 1L), (9L, 2L), (1L, 3L))
    val ys = Seq((7L, 4L), (9L, 9L), (3L, 6L), (8L, 0L))
    val merged = agg.merge(reduceAll(xs), reduceAll(ys))
    assert(merged == reduceAll(xs ++ ys))
    assert(merged.size == 3)
    assert(agg.merge(agg.zero, reduceAll(ys)) == reduceAll(ys))
    assert(agg.merge(reduceAll(xs), agg.zero) == reduceAll(xs))
  }

  test("q_topk_agg equals the window-rank recompute on real data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val viaAgg = queries.Relational.q_topk_agg(spark, sf).collect().toSeq
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("price_c").desc, col("p_partkey"))
    val viaWin = Tables.part(spark, sf)
      .select(col("p_brand"),
        floor(lit(100.0) * col("p_retailprice")).cast("long").as("price_c"),
        col("p_partkey"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("price_c"), col("p_partkey"))
      .orderBy(col("p_brand"), col("rn"))
      .collect().toSeq
    assert(viaAgg == viaWin)
  }
}
