package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 connector's three scale properties: split planning with
  * pushdown-driven partition PRUNING (bounded filters plan fewer tasks),
  * exact filter semantics (pushed conjuncts drop no row they shouldn't),
  * and column pruning reaching the reader (the scan description carries
  * the pruned schema). Content is checked against an independent
  * spark.range reconstruction of the same integer arithmetic. */
class GenSourceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("content equals an independent spark.range reconstruction") {
    val got = gen(10000, 4)
    val want = spark.range(0, 10000).toDF("id")
      .select(col("id"), (col("id") % 997L).as("user_id"),
        element_at(
          array(lit("click"), lit("view"), lit("purchase"), lit("error"), lit("scroll")),
          (col("id") % 5L).cast("int") + 1).as("event_type"),
        ((col("id") * 1103515245L + 12345L) % 2147483648L).as("v"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == 10000)
  }

  test("filter pushdown prunes input partitions before scheduling") {
    val full = gen(60000, 8)
    assert(full.rdd.getNumPartitions == 8)
    // [0, 7500) covers exactly the first of 8 splits
    val one = gen(60000, 8).filter(col("id") < 7500L)
    assert(one.rdd.getNumPartitions == 1,
      s"expected 1 surviving split, got ${one.rdd.getNumPartitions}")
    assert(one.count() == 7500)
    // a mid-range band touches exactly two splits
    val two = gen(60000, 8).filter(col("id") >= 11000L && col("id") < 16000L)
    assert(two.rdd.getNumPartitions == 2)
    assert(two.count() == 5000)
    // pushed bounds are exact: Spark plans no post-scan Filter on id
    val plan = two.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[11000,15999]"), s"bounds not pushed:\n$plan")
  }

  test("column pruning reaches the reader") {
    val df = gen(1000, 2).select(col("v"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=v"), s"pruned schema not at the scan:\n$scan")
    assert(df.as[Long].collect().sum ==
      (0L until 1000L).map(id => (id * 1103515245L + 12345L) % 2147483648L).sum)
  }

  test("seeded property: random bounds give closed-form row and split counts") {
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 25) {
      val rows = 1000L + rnd.nextInt(9000)
      val parts = 1 + rnd.nextInt(7)
      val a = rnd.nextLong(rows + 200) - 100 // bounds may fall outside [0, rows)
      val b = rnd.nextLong(rows + 200) - 100
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val df = gen(rows, parts).filter(col("id") >= lo && col("id") <= hi)
      val want = math.max(0L, math.min(hi, rows - 1) - math.max(lo, 0L) + 1)
      assert(df.count() == want, s"rows=$rows parts=$parts [$lo,$hi]")
      // surviving splits = those whose id range intersects the clamped bounds
      val per = math.max(1L, (rows + parts - 1) / parts)
      val wantSplits = (0 until parts).count { k =>
        math.max(k * per, math.max(lo, 0L)) <=
          math.min((k + 1) * per - 1, math.min(hi, rows - 1))
      }
      if (wantSplits > 0)
        assert(df.rdd.getNumPartitions == wantSplits,
          s"rows=$rows parts=$parts [$lo,$hi]: " +
            s"got ${df.rdd.getNumPartitions}, want $wantSplits")
    }
  }

  test("q_source_gen: groups cover all five types with exact band bounds") {
    val rows = queries.Analytics5.q_source_gen(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq ==
      Seq("click", "error", "purchase", "scroll", "view"))
    assert(rows.map(_._2).sum == 40000L)
    assert(rows.map(_._4).min == 10000L && rows.map(_._5).max == 49999L)
  }
}
