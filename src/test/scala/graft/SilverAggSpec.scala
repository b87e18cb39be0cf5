package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LogSource
import graft.streaming.StreamOps
import graft.tables.TxTable

/** The bronze→silver hop with a WATERMARK in the middle: broker-shaped
  * topic → watermarked tumbling aggregation → exactly-once TxTable sink.
  * Every piece is pinned alone elsewhere (LogSourceSpec, the stream
  * twins, TxStreamSinkSpec); this spec pins the composition nobody else
  * exercises — that append-mode window FINALIZATION (driven by the
  * watermark advancing across admission-capped micro-batches) composes
  * with the sink's idempotent batch commits: each window version lands
  * exactly once, unfinalized windows stay out, and a later run's new
  * data finalizes them without disturbing what already landed. */
class SilverAggSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val B = 1704067200000000L // micros; whole hours, window-aligned

  /** One record per minute; ids map 1:1 to minutes past B. */
  private def minuteRec(id: Long): (Long, Long, Long, Double) =
    (id, B + id * 60000000L, id % 5, id * 0.5)

  /** The batch twin: exact per-15-min-window counts and dyadic sums. */
  private def twin(ids: Seq[Long]): Map[Long, (Long, Double)] =
    ids.groupBy(id => (B / 1000000L + id * 60L) / 900L * 900L)
      .map { case (ws, in) => (ws, (in.size.toLong, in.map(_ * 0.5).sum)) }

  test("watermarked window agg between broker source and table sink finalizes exactly once") {
    val topic = Files.createTempDirectory("graft_silver_topic").toString
    val silverRoot = Files.createTempDirectory("graft_silver_table").toString
    val ckpt = Files.createTempDirectory("graft_silver_ckpt").toString
    val silver = new TxTable(silverRoot, Seq("ws_s"))

    def run(): Unit = {
      val agg = spark.readStream.format("graft.sources.LogSource")
        .option("path", topic)
        .option("maxRecordsPerTrigger", "25") // several batches → watermark advances mid-run
        .load()
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v_sum"))
        .select(unix_seconds(col("w.start")).as("ws_s"), col("n"), col("v_sum"))
      val q = StreamOps.txTableSink(agg, silver, "silver_agg", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "silver run did not finish")
    }
    def landed(): Map[Long, (Long, Double)] =
      silver.read(spark).select(col("ws_s"), col("n"), col("v_sum"))
        .as[(Long, Long, Double)].collect().map(r => (r._1, (r._2, r._3))).toMap

    // run 1: 90 minutes of data = 6 complete 15-min windows. The 10-min
    // watermark can never finalize the LAST window within this run (its
    // end is past max-event-time − 10 min), so run 1 lands a strict,
    // non-empty prefix — every landed window already bit-exact.
    LogSource.append(topic, 0, (0L until 90L).map(minuteRec))
    run()
    val full = twin(0L until 90L)
    val first = landed()
    assert(first.nonEmpty, "watermark advance across capped batches must finalize windows")
    assert(!first.contains(full.keys.max), "an unfinalizable window must not land")
    first.foreach { case (ws, got) =>
      assert(full(ws) == got, s"window $ws landed wrong: $got vs ${full(ws)}") }

    // run 2: one far-future record pushes the watermark past everything
    // from run 1 — the held-back windows finalize now, exactly once, and
    // the sentinel's own (unfinalizable) window stays out.
    LogSource.append(topic, 0, Seq(minuteRec(600)))
    run()
    assert(landed() == full,
      "run 2 must finalize exactly the held-back windows — no loss, no replay")

    // run 3: nothing new at the broker → nothing may land (no empty
    // commits, no re-emitted windows through the composed checkpoints)
    val v = silver.currentVersion
    run()
    assert(silver.currentVersion == v, "an idle run must not commit")
    assert(landed() == full)

    // and the silver table is itself a stream: a downstream consumer
    // reads the finalized windows off the change feed — the full
    // medallion loop (broker → watermarked agg → table → stream) with
    // exactly-once at every hop. Appends are never change commits, so
    // no skipChangeCommits is needed.
    val gold = Files.createTempDirectory("graft_silver_gold").toString
    val goldCkpt = Files.createTempDirectory("graft_silver_gold_ckpt").toString
    def consume(): Unit = {
      val q = spark.readStream.format("graft.sources.TxTableSource")
        .option("path", silverRoot).load()
        .writeStream.format("parquet").option("path", gold)
        .option("checkpointLocation", goldCkpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "downstream consumer did not finish")
    }
    consume()
    val downstream = spark.read.parquet(gold)
      .select(col("ws_s"), col("n"), col("v_sum"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, (r._2, r._3))).toMap
    assert(downstream == full,
      "the change-feed consumer must see exactly the finalized windows, once")
  }
}
