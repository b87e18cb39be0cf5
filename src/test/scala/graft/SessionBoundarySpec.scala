package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's session-window merge rule at the exact gap boundary so the
  * DuckDB oracle's gaps-and-islands formulation (new session iff
  * gap >= 30min) provably matches (SURVEY §7.4 risk 4). */
class SessionBoundarySpec extends AnyFunSuite with SparkFixture {

  private def sessions(tsSeconds: Seq[Long]): Long = {
    import spark.implicits._
    val df = tsSeconds.toDF("s").select(timestamp_seconds(col("s")).as("ts"))
    df.groupBy(session_window(col("ts"), "30 minutes")).count().count()
  }

  test("gap of exactly 30min MERGES (so the oracle opens sessions on >)") {
    assert(sessions(Seq(0L, 1800L)) == 1)
  }

  test("gap of 30min + 1us starts a new session") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, session_window, timestamp_micros}
    val df = Seq(0L, 1800000001L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.groupBy(session_window(col("ts"), "30 minutes")).count().count() == 2)
  }

  test("gap just under 30min merges") {
    assert(sessions(Seq(0L, 1799L)) == 1)
  }

  test("single event session spans [ts, ts+gap)") {
    import spark.implicits._
    val row = Seq(1000L).toDF("s").select(timestamp_seconds(col("s")).as("ts"))
      .groupBy(session_window(col("ts"), "30 minutes").as("w")).count()
      .select(unix_micros(col("w.start")), unix_micros(col("w.end")))
      .head()
    assert(row.getLong(0) == 1000L * 1000000)
    assert(row.getLong(1) == (1000L + 1800) * 1000000)
  }
}
