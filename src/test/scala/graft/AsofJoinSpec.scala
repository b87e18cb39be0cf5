package graft

import graft.plans.{AsofJoin, AsofJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the native as-of join operator (custom LogicalPlan +
  * Strategy + SparkPlan): row-for-row equality with the lag-window twin on
  * real data, null extension for matchless left rows, plan shape (the
  * custom exec node actually plans, under sorted+clustered children), and
  * cross-relation lookups the window formulation cannot express. */
class AsofJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("native as-of equals the lag-window twin row for row") {
    val native = graft.queries.Analytics2.q_join_asof_native(spark, sf).collect().toSeq
    val twin = graft.queries.Relational.q_join_asof(spark, sf).collect().toSeq
    assert(native.nonEmpty && native == twin)
  }

  test("AsofJoinExec plans with clustered+sorted children and no window") {
    val df = graft.queries.Analytics2.q_join_asof_native(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"custom exec missing from plan:\n$p")
    assert(!p.contains("Window"), s"window crept into the native plan:\n$p")
  }

  test("matchless left rows null-extend; first-per-key matches nothing") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 9L, 900L), (1L, 15L, 901L), (1L, 20L, 902L), (2L, 6L, 903L))
      .toDF("rk", "rt", "rid")
    val out = AsofJoin.join(left, right, Seq("k" -> "rk"), Seq("t" -> "rt"))
      .select("k", "t", "lid", "rid").as[(Long, Long, Long, Option[Long])]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      (1L, 10L, 100L, Some(900L)),   // 9 < 10
      (1L, 20L, 101L, Some(901L)),   // 15 < 20; 20 is NOT strictly prior
      (2L, 5L, 102L, None),          // right 6 > 5
      (3L, 7L, 103L, None)))         // key absent on the right
  }

  test("cross-relation as-of: lookup against a different table") {
    // purchases against a CLICKS-only history — inexpressible as one lag
    // window without unioning the relations first
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("event_id").as("r_event_id"),
        col("ts_us").as("r_ts_us"))
    val got = AsofJoin.join(purchases, clicks,
      Seq("user_id" -> "r_user"), Seq("ts_us" -> "r_ts_us", "event_id" -> "r_event_id"))
      .select("event_id", "r_event_id").as[(Long, Option[Long])].collect().toMap
    // reference: max prior click per purchase via a plain join + argmax
    val want = purchases.as("p")
      .join(clicks.as("c"), col("p.user_id") === col("c.r_user") &&
        (col("c.r_ts_us") < col("p.ts_us") ||
          (col("c.r_ts_us") === col("p.ts_us") && col("c.r_event_id") < col("p.event_id"))), "left")
      .groupBy(col("p.event_id"))
      .agg(max(struct(col("c.r_ts_us"), col("c.r_event_id"))).as("m"))
      .select(col("event_id"), col("m.r_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got.nonEmpty && got == want)
  }

  // shared truth table for the direction/tolerance/exact knobs
  private def tinyLeft = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
    .toDF("k", "t", "lid")
  private def tinyRight = Seq((1L, 8L, 900L), (1L, 10L, 901L), (1L, 14L, 902L),
    (1L, 40L, 903L), (2L, 5L, 904L)).toDF("rk", "rt", "rid")

  private def run(fwd: Boolean, tol: Option[Long], exact: Boolean): Map[Long, Option[Long]] =
    AsofJoin.join(tinyLeft, tinyRight, Seq("k" -> "rk"), Seq("t" -> "rt"),
      forward = fwd, tolerance = tol, allowExact = exact)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

  test("forward direction: first strictly-after right row per left row") {
    assert(run(fwd = true, tol = None, exact = false) == Map(
      100L -> Some(902L),  // t=10: first after is 14 (10 is not strictly after)
      101L -> Some(903L),  // t=20: first after is 40
      102L -> None))       // t=5: right 5 is equal, not strictly after
  }

  test("allowExact shifts both directions to at-or: equal rows match") {
    assert(run(fwd = true, tol = None, exact = true) == Map(
      100L -> Some(901L),  // equal t=10 now matches forward
      101L -> Some(903L),
      102L -> Some(904L))) // equal t=5 matches
    assert(run(fwd = false, tol = None, exact = true) == Map(
      100L -> Some(901L),  // equal t=10 beats prior t=8 backward
      101L -> Some(902L),
      102L -> Some(904L)))
  }

  test("tolerance nulls matches beyond the bound in both directions") {
    // tolerance filters the as-of candidate, it never falls back to an
    // older/newer in-bound row — pandas merge_asof semantics
    assert(run(fwd = false, tol = Some(2L), exact = false) == Map(
      100L -> Some(900L),  // t=10's strict-prior candidate t=8: 2 away, kept
      101L -> None,        // t=20's candidate t=14: 6 away, beyond 2
      102L -> None))       // t=5: no strict-prior row at all
    assert(run(fwd = true, tol = Some(4L), exact = false) == Map(
      100L -> Some(902L),  // t=10 → t=14: 4 away, kept
      101L -> None,        // t=20 → t=40: 20 away, beyond 4
      102L -> None))
  }

  test("forward differential: native equals the lead-window form on real data") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val hist = ev.select(col("user_id").as("r_user"), col("event_id").as("r_event_id"),
      col("ts_us").as("r_ts_us"))
    val got = AsofJoin.join(purchases, hist,
      Seq("user_id" -> "r_user"), Seq("ts_us" -> "r_ts_us", "event_id" -> "r_event_id"),
      forward = true)
      .select("event_id", "r_event_id").as[(Long, Option[Long])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val want = ev
      .withColumn("next_id", lead(col("event_id"), 1).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("next_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got.nonEmpty && got == want)
  }
}
