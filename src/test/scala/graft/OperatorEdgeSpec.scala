package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built edge cases per operator family (SURVEY §5.2(2)): empty join
  * side, NULL keys, tied ranks, first-row lag, decimal sum exactness. */
class OperatorEdgeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("left join against empty right side counts 0, not null rows lost") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val right = Seq((99L, 5.0)).toDF("id", "x").filter(col("x") > 100)
    val out = left.join(right, Seq("id"), "left_outer")
      .groupBy(col("id")).agg(count(col("x")).as("n")).orderBy(col("id"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("NULL keys never equi-join (SQL semantics, not NULL-safe)") {
    val a = Seq(Some(1L), None).toDF("k")
    val b = Seq(Some(1L), None).toDF("k")
    assert(a.join(b, Seq("k")).count() == 1)
    assert(a.join(b, a("k") <=> b("k")).count() == 2) // null-safe variant
  }

  test("rank vs dense_rank vs row_number on ties") {
    val df = Seq(("g", 10.0, 1L), ("g", 10.0, 2L), ("g", 5.0, 3L)).toDF("g", "v", "id")
    val w = Window.partitionBy($"g").orderBy($"v".desc)
    val r = df.select(rank().over(w).as("rk"), dense_rank().over(w).as("drk")).distinct().count()
    assert(r == 2) // (1,1) twice and (3,2)
    val wt = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val rn = df.select($"id", row_number().over(wt).as("rn")).orderBy($"rn")
      .collect().map(_.getLong(0)).toSeq
    assert(rn == Seq(1L, 2L, 3L)) // tiebreaker makes it total
  }

  test("lag yields NULL on first row of each partition") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 15.0), (2L, 3L, 7.0)).toDF("u", "id", "v")
    val w = Window.partitionBy($"u").orderBy($"id")
    val out = df.withColumn("d", $"v" - lag($"v", 1).over(w))
      .orderBy($"u", $"id").collect()
    assert(out(0).isNullAt(3) && out(1).getDouble(3) == 5.0 && out(2).isNullAt(3))
  }

  test("decimal sum is exact where double sum need not be") {
    val vals = Seq.fill(1000)(0.1)
    val df = vals.toDF("v")
    val dec = df.agg(sum($"v".cast("decimal(18,2)")).cast("decimal(18,2)")).head.getDecimal(0)
    assert(dec.toString == "100.00")
  }

  test("empty aggregation group set yields empty result, count-only yields 0") {
    val df = Seq((1, 2)).toDF("a", "b").filter($"a" > 5)
    assert(df.groupBy($"a").count().count() == 0)
    assert(df.agg(count(lit(1))).head.getLong(0) == 0L)
  }

  test("rolling-hash fingerprint fold matches a reference implementation") {
    val df = Seq("scan merge table").toDF("text")
    val got = df.select(expr(
      "aggregate(transform(split(text, ' '), w -> CAST(ascii(w) + length(w) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)")).head.getLong(0)
    val expected = "scan merge table".split(" ")
      .map(w => w.head.toLong + w.length)
      .foldLeft(0L)((acc, x) => (acc * 31 + x) % 1000000007)
    assert(got == expected)
  }
}
