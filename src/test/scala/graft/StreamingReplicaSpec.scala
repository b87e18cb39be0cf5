package graft

import java.nio.file.Files

import graft.streaming.StreamOps
import graft.tables.TxTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** CONTINUOUS CDC-apply replication (SURVEY §2.16): the source TxTable
  * read as a ROW-LEVEL change stream (`TxTableSource` with
  * `readChangeFeed=true` — each micro-batch the tagged insert/delete
  * diff of whole source versions) drives `StreamOps.txReplicaSink`,
  * which folds every micro-batch into a replica TxTable exactly once
  * under the `queryName → batchId` manifest watermark. The batch face
  * (`applyChangesFrom`) is pinned by ReplicationSpec; this spec pins
  * the STREAMING face: convergence across a history that mixes appends,
  * a merge, a band delete, and a compaction; checkpointed restart that
  * resumes at the committed source version; and the replica-side
  * refusal of a replayed micro-batch (foreachBatch is at-least-once —
  * the crash window between sink commit and checkpoint commit is
  * closed by the replica's own watermark, not by the engine). */
class StreamingReplicaSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("user_id")
      .withColumn("v", col("user_id") * 7 % 100)

  private def freshTable(prefix: String): TxTable =
    new TxTable(Files.createTempDirectory(prefix).toString, Seq("user_id"))

  private def cdfStream(src: TxTable, maxVersions: Int = 1) =
    spark.readStream.format("graft.sources.TxTableSource")
      .option("path", src.root)
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", maxVersions.toString)
      .load()

  private def drainInto(src: TxTable, dst: TxTable, ckpt: String,
      queryName: String = "replica_q"): Unit = {
    val q = StreamOps.txReplicaSink(cdfStream(src), dst, "user_id",
        queryName, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "replication stream did not finish")
  }

  private def content(t: TxTable): Seq[(Long, Long)] =
    t.read(spark).select(col("user_id"), col("v"))
      .as[(Long, Long)].collect().sorted.toSeq

  test("cdf stream replicates an append+merge+delete+compaction history exactly") {
    val src = freshTable("graft_streprl_src")
    src.append(spark, rows(0, 40))                        // v1
    src.append(spark, rows(40, 80))                       // v2
    // v3: merge updates 10..19 and inserts 80..89
    val upd = rows(10, 20).withColumn("v", col("v") + 1000)
    src.merge(spark, upd.unionByName(rows(80, 90)), "user_id")
    src.delete(spark, "user_id", 30, 49)                  // v4: band delete
    src.compact(spark, smallRows = Long.MaxValue / 2)     // v5: zero-change commit
    val dst = freshTable("graft_streprl_dst")
    val ckpt = Files.createTempDirectory("graft_streprl_ckpt").toString
    drainInto(src, dst, ckpt)
    assert(content(dst) == content(src), "replica must equal the source live state")
    // one micro-batch per source version (maxVersionsPerTrigger=1), each
    // folded exactly once under the SOURCE-VERSION watermark; the
    // compaction's cancelled-to-zero batch is skipped without a commit,
    // so the watermark sits at the last version that carried rows (v4)
    assert(dst.snapshot().txns("replica_q") == 4L,
      "watermark must sit at the last folded source version")
  }

  test("restart resumes at the checkpointed source version and converges") {
    val src = freshTable("graft_streprl2_src")
    src.append(spark, rows(0, 50))                        // v1
    src.append(spark, rows(50, 100))                      // v2
    val dst = freshTable("graft_streprl2_dst")
    val ckpt = Files.createTempDirectory("graft_streprl2_ckpt").toString
    drainInto(src, dst, ckpt)
    assert(content(dst) == content(src))
    val versionsAfterFirst = dst.currentVersion
    // source moves on while the stream is down
    src.append(spark, rows(100, 120))                     // v3
    src.delete(spark, "user_id", 0, 9)                    // v4
    drainInto(src, dst, ckpt) // same checkpoint: resumes at source v2
    assert(content(dst) == content(src))
    // only the two NEW source versions were folded — a restart that
    // re-read v1..v2 would have burned extra replica commits (and, for
    // the delete, double-applied victims)
    assert(dst.currentVersion == versionsAfterFirst + 2,
      "restart must fold exactly the new source versions")
    // idle restart: nothing new, stream drains zero batches, replica still
    val before = dst.currentVersion
    drainInto(src, dst, ckpt)
    assert(dst.currentVersion == before, "idle restart must not commit")
  }

  test("a replayed micro-batch is recognized by the replica watermark and skipped") {
    val src = freshTable("graft_streprl3_src")
    src.append(spark, rows(0, 30))                        // v1
    src.delete(spark, "user_id", 5, 9)                    // v2
    val dst = freshTable("graft_streprl3_dst")
    val ckpt = Files.createTempDirectory("graft_streprl3_ckpt").toString
    drainInto(src, dst, ckpt)
    val converged = content(dst)
    val version = dst.currentVersion
    // crash replay: foreachBatch re-delivers source v2's slice; the
    // replica watermark sits at source version 2 after the drain, so a
    // replayed fold at or below it is refused
    val replayed = src.rowChangesBetween(spark, 1, 2)
    assert(!dst.applyChangeRows(spark, replayed, "replica_q", 2L, "user_id"),
      "replayed batch must be refused")
    assert(dst.currentVersion == version && content(dst) == converged,
      "refused replay must leave the replica untouched")
    // the same rows under a NEW watermark do fold (proves the refusal was
    // the watermark, not the content): victims are already gone, so the
    // delete-side exceptAll removes nothing and content is unchanged
    assert(dst.applyChangeRows(spark, replayed, "replica_q", 3L, "user_id"))
    assert(content(dst) == converged)
  }

  test("the change stream carries row tags and a compaction version emits zero rows") {
    val src = freshTable("graft_streprl4_src")
    // explicit 4-file layout: the optimized write would otherwise land
    // v1 as ONE file and the compaction below would no-op, shifting the
    // version numbering this test pins
    src.append(spark, rows(0, 20).repartition(4))         // v1
    src.compact(spark, smallRows = Long.MaxValue / 2)     // v2
    src.delete(spark, "user_id", 0, 4)                    // v3
    val q = cdfStream(src, maxVersions = 10).writeStream
      .format("memory").queryName("cdf_mem")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.table("cdf_mem")
      .select(col("_commit_version"), col("_change_type"), col("user_id"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got.count(_._1 == 1L) == 20, "v1's rows arrive as inserts")
    assert(got.filter(_._1 == 1L).forall(_._2 == "insert"))
    assert(!got.exists(_._1 == 2L), "the compaction's diff cancels to zero rows")
    val del = got.filter(_._1 == 3L)
    assert(del.map(_._3).sorted == (0L to 4L) && del.forall(_._2 == "delete"),
      "the delete emits exactly its victims")
  }

  test("snapshot bootstrap + tail stream: the replica never replays the history") {
    val src = freshTable("graft_streprl6_src")
    src.append(spark, rows(0, 30))                        // v1
    src.append(spark, rows(30, 60))                       // v2
    src.delete(spark, "user_id", 10, 19)                  // v3
    src.compact(spark, smallRows = Long.MaxValue / 2)     // v4
    val dst = freshTable("graft_streprl6_dst")
    // bootstrap: ONE content copy at v4 + the watermark, in one commit
    val bootV = dst.bootstrapFrom(spark, src, "replica_q")
    assert(bootV == 4 && dst.currentVersion == 1)
    assert(content(dst) == content(src))
    // source moves on; the stream starts at the bootstrapped version and
    // reads ONLY the tail — v1..v4's five-figure replay never happens.
    // SAME appId as the bootstrap: the sink's source-version watermark
    // composes with the bootstrap's (batchId watermarking would refuse
    // the first tail batch — batch 0 <= bootstrap watermark 4 — and
    // silently freeze the replica)
    src.append(spark, rows(60, 80))                       // v5
    src.delete(spark, "user_id", 0, 4)                    // v6
    val ckpt = Files.createTempDirectory("graft_streprl6_ckpt").toString
    val q = StreamOps.txReplicaSink(
        spark.readStream.format("graft.sources.TxTableSource")
          .option("path", src.root)
          .option("readChangeFeed", "true")
          .option("maxVersionsPerTrigger", "1")
          .option("startingVersion", (bootV + 1).toString) // inclusive (Delta)
          .load(),
        dst, "user_id", "replica_q", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(content(dst) == content(src), "bootstrap + tail must converge")
    assert(dst.currentVersion == 3,
      "exactly two tail batches on top of the bootstrap commit — a replay " +
        "of v1..v4 would have burned four more")
  }

  test("a REPLACED checkpoint does not diverge the replica: the version " +
      "watermark trims the telescoped backlog to the unseen tail") {
    val src = freshTable("graft_streprl9_src")
    src.append(spark, rows(0, 30))                        // v1
    src.delete(spark, "user_id", 5, 9)                    // v2
    val dst = freshTable("graft_streprl9_dst")
    val ckpt1 = Files.createTempDirectory("graft_streprl9_ckpt1").toString
    drainInto(src, dst, ckpt1)
    assert(content(dst) == content(src))
    val replicaV = dst.currentVersion
    // the checkpoint is LOST (operator error, relocation); the source
    // moves on; the restarted query gets a FRESH checkpoint — batchIds
    // restart at 0 and AvailableNow telescopes v1..v4 into one batch
    src.append(spark, rows(30, 50))                       // v3
    src.delete(spark, "user_id", 0, 2)                    // v4
    val ckpt2 = Files.createTempDirectory("graft_streprl9_ckpt2").toString
    val q = StreamOps.txReplicaSink(cdfStream(src, maxVersions = 10),
        dst, "user_id", "replica_q", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    // batchId watermarking would have refused the whole telescoped batch
    // (batch 0 <= stored watermark) while the checkpoint committed past
    // it — permanent silent divergence; the version-domain trim folds
    // exactly v3..v4 and converges
    assert(content(dst) == content(src),
      "replica must converge across a checkpoint replacement")
    assert(dst.currentVersion == replicaV + 1,
      "the telescoped tail folds as ONE slice (v3+v4), nothing re-applied")
    assert(dst.snapshot().txns("replica_q") == 4L)
  }

  test("bootstrap refuses a non-empty replica; bootstrap+batch-sync composes") {
    val src = freshTable("graft_streprl7_src")
    src.append(spark, rows(0, 20))                        // v1
    val dst = freshTable("graft_streprl7_dst")
    assert(dst.bootstrapFrom(spark, src, "sync_q") == 1)
    intercept[IllegalArgumentException] {
      dst.bootstrapFrom(spark, src, "sync_q")
    }
    // idle sync after bootstrap: recognized from the bootstrap watermark
    assert(dst.applyChangesFrom(spark, src, "sync_q", "user_id") == 1)
    assert(dst.currentVersion == 1, "idle sync after bootstrap must no-op")
    src.delete(spark, "user_id", 0, 9)                    // v2
    assert(dst.applyChangesFrom(spark, src, "sync_q", "user_id") == 2)
    assert(content(dst) == content(src))
  }

  test("schema evolution flows through the CDF stream: early rows align with NULLs") {
    val src = freshTable("graft_streprl8_src")
    src.append(spark, rows(0, 10))                        // v1: (user_id, v)
    src.append(spark, rows(10, 20)
      .withColumn("extra", col("user_id") + 1000))        // v2: + extra
    val q = cdfStream(src, maxVersions = 10).writeStream
      .format("memory").queryName("cdf_evo")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.table("cdf_evo")
      .select(col("user_id"), col("extra"), col("_commit_version"))
      .as[(Long, Option[Long], Long)].collect().toSeq
    assert(got.size == 20)
    assert(got.filter(_._3 == 1L).forall(_._2.isEmpty),
      "pre-evolution rows must carry NULL for the later column")
    assert(got.filter(_._3 == 2L).forall(r => r._2.contains(r._1 + 1000)),
      "post-evolution rows carry their values")
    // and the evolved feed REPLICATES: the replica converges to the
    // evolved schema with NULLs where the source itself reads NULLs
    val dst = freshTable("graft_streprl8_dst")
    val ckpt = Files.createTempDirectory("graft_streprl8_ckpt").toString
    drainInto(src, dst, ckpt)
    val srcRows = src.read(spark).select(col("user_id"), col("extra"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    val dstRows = dst.read(spark).select(col("user_id"), col("extra"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    assert(dstRows == srcRows)
  }

  test("skipChangeCommits does not compose with readChangeFeed") {
    val src = freshTable("graft_streprl5_src")
    src.append(spark, rows(0, 5))
    val ex = intercept[Exception] {
      spark.readStream.format("graft.sources.TxTableSource")
        .option("path", src.root)
        .option("readChangeFeed", "true")
        .option("skipChangeCommits", "true")
        .load().writeStream.format("memory").queryName("cdf_bad")
        .trigger(Trigger.AvailableNow()).start()
        .awaitTermination(60000)
    }
    assert(ex.getMessage != null)
  }
}
