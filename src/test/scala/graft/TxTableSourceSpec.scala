package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Pins the table-as-stream face ([[graft.sources.TxTableSource]]) and
  * the batch change-data-feed behind it ([[TxTable.changesBetween]]):
  * version offsets ride the checkpoint (restart consumes exactly the
  * appends made while down), change commits fail the stream by default,
  * `skipChangeCommits` passes a compaction with neither loss nor
  * duplication, and CDC rows carry exact `_commit_version` tags. */
class TxTableSourceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def keyed(lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("k").withColumn("v", col("k") * 10).coalesce(1)

  /** Drain the table stream into a parquet file sink (the memory sink
    * cannot recover from a checkpoint, which is the thing under test). */
  private def drain(root: String, ckpt: String, out: String,
      skipChangeCommits: Boolean = false): Unit = {
    val q = spark.readStream.format("graft.sources.TxTableSource")
      .option("path", root)
      .option("skipChangeCommits", skipChangeCommits.toString)
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
  }

  private def sinkKeys(out: String): Seq[Long] =
    spark.read.parquet(out).select(col("k")).as[Long].collect().sorted.toSeq

  test("streams appends; restart from checkpoint sees later versions exactly once") {
    val root = Files.createTempDirectory("graft_txsrc").toString
    val ckpt = Files.createTempDirectory("graft_txsrc_ckpt").toString
    val out = Files.createTempDirectory("graft_txsrc_out").toString
    val t = new TxTable(root, Seq("k"))
    t.append(spark, keyed(0, 40))   // v1
    t.append(spark, keyed(40, 70))  // v2
    drain(root, ckpt, out)
    assert(sinkKeys(out) == (0L until 70L))

    // producer commits while the consumer is down; restart from the SAME
    // checkpoint must deliver exactly the new versions — no replays
    t.append(spark, keyed(70, 90))  // v3
    t.append(spark, keyed(90, 95))  // v4
    drain(root, ckpt, out)
    assert(sinkKeys(out) == (0L until 95L),
      "restart must consume exactly the appended versions once")
  }

  test("a change commit fails the stream by default, then skipChangeCommits recovers the same checkpoint") {
    val root = Files.createTempDirectory("graft_txsrc_cc").toString
    val ckpt = Files.createTempDirectory("graft_txsrc_cc_ckpt").toString
    val out = Files.createTempDirectory("graft_txsrc_cc_out").toString
    val t = new TxTable(root, Seq("k"))
    t.append(spark, keyed(0, 30))   // v1
    drain(root, ckpt, out)
    assert(sinkKeys(out) == (0L until 30L))

    t.append(spark, keyed(30, 50))          // v2: real new rows
    t.compact(spark, smallRows = 1000000)   // v3: rewrite — a change commit
    val ex = intercept[StreamingQueryException] { drain(root, ckpt, out) }
    assert(ex.getMessage.contains("rewrote files") ||
      Option(ex.getCause).exists(_.getMessage.contains("rewrote files")),
      s"expected the change-commit refusal, got $ex")

    // recovery on the SAME checkpoint: the failed batch re-runs with the
    // change commit skipped — v2's appends arrive, the compaction's
    // rewritten bytes never do (no loss, no duplication)
    drain(root, ckpt, out, skipChangeCommits = true)
    assert(sinkKeys(out) == (0L until 50L))

    // and the stream keeps following appends after the skipped rewrite
    t.append(spark, keyed(50, 60))  // v4
    drain(root, ckpt, out, skipChangeCommits = true)
    assert(sinkKeys(out) == (0L until 60L))
  }

  test("AvailableNow honors maxVersionsPerTrigger: capped batches, drains to the start snapshot") {
    val root = Files.createTempDirectory("graft_txsrc_bp").toString
    val ckpt = Files.createTempDirectory("graft_txsrc_bp_ckpt").toString
    val out = Files.createTempDirectory("graft_txsrc_bp_out").toString
    val t = new TxTable(root, Seq("k"))
    (0 until 5).foreach(i => t.append(spark, keyed(i * 10L, i * 10L + 10L))) // v1..v5

    val q = spark.readStream.format("graft.sources.TxTableSource")
      .option("path", root).option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "capped AvailableNow run did not finish")

    // all 5 pending versions arrive — but in ceil(5/2)=3 admission-controlled
    // micro-batches, not the single uncontrolled fallback batch (the offsets
    // log has one entry per planned batch)
    assert(sinkKeys(out) == (0L until 50L))
    val batches = new java.io.File(ckpt, "offsets").list().count(!_.contains("."))
    assert(batches == 3, s"expected 3 capped batches, offsets log has $batches")
  }

  test("changesBetween tags rows with their commit version and refuses change commits by default") {
    val root = Files.createTempDirectory("graft_txsrc_cdc").toString
    val t = new TxTable(root, Seq("k"))
    t.append(spark, keyed(0, 5))    // v1
    t.append(spark, keyed(10, 13))  // v2
    val cdc = t.changesBetween(spark, 0, 2)
      .select(col("k"), col("_commit_version"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(cdc == ((0L until 5L).map((_, 1L)) ++ (10L until 13L).map((_, 2L))))
    // an incremental consumer reads only its window
    assert(t.changesBetween(spark, 1, 2)
      .select(col("k")).as[Long].collect().sorted.toSeq == (10L until 13L))

    t.merge(spark, keyed(0, 2), "k") // v3: rewrite — a change commit
    intercept[IllegalStateException] { t.changesBetween(spark, 0, 3) }
    // skipped, the window collapses to the appends
    assert(t.changesBetween(spark, 2, 3, skipChangeCommits = true).count() == 0)
    assert(t.versionDelta(3).removedFiles > 0)
  }

  test("q_table_changes' gate build tags every row by its append batch") {
    val df = graft.queries.TableOps.changesApplied(spark, "/root/testdata/sf0.001")
    val bad = df.filter(col("_commit_version") =!= col("user_id") % 3 + 1).count()
    assert(bad == 0, s"$bad rows tagged with the wrong commit version")
    val total = graft.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(df.count() == total, "CDC over the appends must cover every event row")
  }
}
