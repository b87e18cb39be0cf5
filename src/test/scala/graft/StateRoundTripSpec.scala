package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production shape of incremental maintenance that q_agg_incremental
  * and q_join_incremental prove only in-memory: the old-state partial
  * aggregate is WRITTEN TO PARQUET by one job and read back by a later
  * one before the new batch folds in — so the merge law must survive
  * storage, not just a query plan. The sharp edge this pins is decimal
  * fidelity through the parquet round-trip: the partial's DECIMAL sum
  * must come back bit-exact or the re-aggregated total silently drifts
  * from the full recompute (doubles would not survive this pattern;
  * that is WHY the engine's money sums are decimal). */
class StateRoundTripSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("parquet-stored partial aggregate + one batch fold == full recompute, bit-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), dayofmonth(col("ts")).as("d"))
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("s_dec"))

    // job 1: aggregate history, persist the state table
    partial(ev.filter(col("d") % 2 === 0)).write.mode("overwrite").parquet(dir)

    // job 2 (a later run): read state back, fold the new batch
    val state = spark.read.parquet(dir)
    val merged = state.unionByName(partial(ev.filter(col("d") % 2 === 1)))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s_dec")).as("s_dec"))
      .select(col("event_type"), col("n"), col("s_dec").cast("double").as("s"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

    val full = partial(ev)
      .select(col("event_type"), col("n"), col("s_dec").cast("double").as("s"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

    assert(merged == full) // incl. bit-equal doubles at emission
    assert(merged.nonEmpty && merged.map(_._2).sum == ev.count())
  }

  test("q_join_stored: parquet-stored join partials + one batch fold == full join") {
    val got = queries.Analytics5.q_join_stored(spark, sf)
      .as[(String, Long, Double)].collect().toSeq

    // independent full recompute (the oracle's formulation, in-engine)
    val full = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("rev"))
      .orderBy(col("o_orderpriority"))
      .as[(String, Long, Double)].collect().toSeq

    assert(got == full) // incl. bit-equal doubles: decimal state survived disk
    // and the state table really was published to (and read from) parquet
    val fp = Tables.sourceFingerprint(sf, "orders.parquet", "lineitem.parquet")
    val marker = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_joinstate_$fp/_SUCCESS")
    assert(marker.exists(), s"stored-state marker missing: $marker")
  }
}
