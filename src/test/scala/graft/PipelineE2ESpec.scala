package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LogSource
import graft.streaming.StreamOps
import graft.tables.TxTable

/** The full lakehouse loop, composed from this engine's own pieces and
  * pinned exactly-once at EVERY hop: broker-shaped topic
  * ([[graft.sources.LogSource]]) → streaming ingest with idempotent
  * commits ([[StreamOps.txTableSink]] → [[TxTable.appendBatch]]) →
  * table-as-stream downstream consumer ([[graft.sources.TxTableSource]])
  * — with producers appending between runs and a compaction rewriting
  * the table mid-pipeline. Each stage is individually spec-pinned
  * elsewhere; THIS spec pins that they compose: offsets ride two
  * independent checkpoints, the table's txn watermarks deduplicate
  * replays, and maintenance on the middle table is invisible downstream. */
class PipelineE2ESpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val B = 1704067200000000L

  private def rec(id: Long): (Long, Long, Long, Double) =
    (id, B + id * 1000000L, id % 7, id * 1.5)

  test("broker topic -> exactly-once table ingest -> table stream, across restarts and compaction") {
    val topic = Files.createTempDirectory("graft_e2e_topic").toString
    val bronzeRoot = Files.createTempDirectory("graft_e2e_bronze").toString
    val c1 = Files.createTempDirectory("graft_e2e_c1").toString
    val c2 = Files.createTempDirectory("graft_e2e_c2").toString
    val out = Files.createTempDirectory("graft_e2e_out").toString
    val bronze = new TxTable(bronzeRoot, Seq("user_id"))

    def ingest(): Unit = {
      val q = StreamOps.txTableSink(
          spark.readStream.format("graft.sources.LogSource")
            .option("path", topic).load(),
          bronze, "e2e_ingest", c1)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "ingest did not finish")
    }
    def consume(skipChangeCommits: Boolean = false): Unit = {
      val q = spark.readStream.format("graft.sources.TxTableSource")
        .option("path", bronzeRoot)
        .option("skipChangeCommits", skipChangeCommits.toString)
        .load()
        .filter(col("user_id") =!= 6) // a downstream transform rides along
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", c2)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "consumer did not finish")
    }
    def consumed(): Seq[Long] =
      spark.read.parquet(out).select(col("event_id")).as[Long]
        .collect().sorted.toSeq
    def expected(ids: Seq[Long]): Seq[Long] = ids.filter(_ % 7 != 6).sorted

    // hop 1+2+3: produce, ingest, consume
    LogSource.append(topic, 0, (0L until 20L).map(rec))
    LogSource.append(topic, 1, (100L until 115L).map(rec))
    ingest()
    assert(bronze.read(spark).count() == 35)
    consume()
    assert(consumed() == expected((0L until 20L) ++ (100L until 115L)))

    // producers append while both stages are down; each stage's restart
    // picks up exactly the delta through its own checkpoint
    LogSource.append(topic, 0, (20L until 30L).map(rec))
    ingest()
    // an idle re-run of the ingest stage commits nothing (the broker
    // checkpoint is already at the topic end; the redelivered-batch case
    // is pinned directly in TxStreamSinkSpec)
    val vAfter = bronze.currentVersion
    ingest()
    assert(bronze.currentVersion == vAfter, "idle ingest re-run must commit nothing")
    assert(bronze.read(spark).count() == 45)
    consume()
    assert(consumed() == expected((0L until 30L) ++ (100L until 115L)))

    // maintenance on the middle table: compaction rewrites every file,
    // the downstream consumer skips the change commit — no duplicates
    bronze.compact(spark, smallRows = 1000000)
    consume(skipChangeCommits = true)
    assert(consumed() == expected((0L until 30L) ++ (100L until 115L)),
      "a compaction must be invisible downstream")

    // and the pipeline keeps flowing end to end after maintenance
    LogSource.append(topic, 1, (115L until 120L).map(rec))
    ingest()
    consume(skipChangeCommits = true)
    assert(consumed() == expected((0L until 30L) ++ (100L until 120L)))
  }
}
