package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamOps
import graft.tables.TxGroup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Atomic MULTI-TABLE streaming ingest ([[StreamOps.txGroupSink]],
  * SURVEY §2.17): one micro-batch lands raw rows in `bronze` and a
  * derived aggregate in `silver`, published together by one group
  * commit. The spec's invariant: at EVERY group version, re-aggregating
  * the bronze cut equals the silver cut — no group reader can ever see
  * a half-applied batch, under replay, restart, or a crash that split
  * the member commits. */
class GroupSinkSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def stageFiles(src: String, batches: Seq[(Long, Long)]): Unit =
    batches.zipWithIndex.foreach { case ((lo, hi), i) =>
      val stage = Files.createTempDirectory(s"graft_gsink_stage$i").toString
      spark.range(lo, hi).toDF("user_id")
        .withColumn("v", col("user_id") * 3)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.toString.endsWith(".parquet")) {
          Files.move(p, Paths.get(src, f"b$i%02d.parquet"),
            StandardCopyOption.ATOMIC_MOVE)
          moved = true
        }
      }
      assert(moved)
    }

  private val members: Seq[(String, Seq[String], DataFrame => DataFrame)] = Seq(
    ("bronze", Seq("user_id"), (b: DataFrame) => b),
    ("silver", Seq("bucket"), (b: DataFrame) =>
      b.groupBy((col("user_id") % 5).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))))

  private def silverOfBronze(bronze: DataFrame) =
    bronze.groupBy((col("user_id") % 5).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(Long, Long, Long)].collect().toSet

  private def silverCut(g: TxGroup, v: Int) =
    g.read(spark, "silver", Seq("bucket"), Some(v))
      .groupBy(col("bucket")).agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .as[(Long, Long, Long)].collect().toSet

  test("every group cut is atomic: bronze re-aggregated equals silver, under replay and restart") {
    val src = Files.createTempDirectory("graft_gsink_src").toString
    stageFiles(src, Seq((0L, 40L), (40L, 70L), (70L, 100L)))
    val g = new TxGroup(Files.createTempDirectory("graft_gsink").toString)
    val ckpt = Files.createTempDirectory("graft_gsink_ckpt").toString
    def run(): Unit = {
      val q = StreamOps.txGroupSink(
          spark.readStream.schema("user_id BIGINT, v BIGINT")
            .option("maxFilesPerTrigger", "1").parquet(src),
          g, members, "gq", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    run()
    assert(g.currentVersion == 3, "one group version per micro-batch")
    // the atomicity invariant at EVERY cut
    (1 to 3).foreach { v =>
      val bronze = g.read(spark, "bronze", Seq("user_id"), Some(v))
      assert(silverOfBronze(bronze) == silverCut(g, v),
        s"group cut $v tore between bronze and silver")
    }
    // full content landed exactly once
    assert(g.read(spark, "bronze", Seq("user_id"))
      .select(col("user_id")).as[Long].collect().sorted.toSeq == (0L until 100L))

    // restart against the same checkpoint with nothing new: no commits
    run()
    assert(g.currentVersion == 3, "an idle restart must mint no group version")

    // direct crash-replay of a committed batch: members skip on their
    // watermarks, the group publish is recognized as already covering it
    val replay = spark.range(40, 70).toDF("user_id").withColumn("v", col("user_id") * 3)
    StreamOps.txGroupBatch(g, members, "gq")(replay, 1L)
    assert(g.currentVersion == 3, "replayed batch minted a group version")
    assert(g.read(spark, "bronze", Seq("user_id")).count() == 100)

    // crash that SPLIT the member commits: bronze landed batch 3, the
    // group publish (and silver) did not — re-delivery completes exactly
    val late = spark.range(100, 130).toDF("user_id").withColumn("v", col("user_id") * 3)
    g.table("bronze", Seq("user_id")).appendBatch(spark, late, "gq/bronze", 3L)
    assert(g.currentVersion == 3, "a member commit alone must not move the group")
    StreamOps.txGroupBatch(g, members, "gq")(late, 3L)
    assert(g.currentVersion == 4)
    val bronze4 = g.read(spark, "bronze", Seq("user_id"))
    assert(bronze4.select(col("user_id")).as[Long].collect().sorted.toSeq ==
      (0L until 130L), "split-crash recovery duplicated or lost bronze rows")
    assert(silverOfBronze(bronze4) == silverCut(g, 4),
      "recovered cut tore between bronze and silver")
  }
}
