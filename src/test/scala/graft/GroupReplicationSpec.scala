package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxGroup

/** GROUP-consistent replication (`TxGroup.replicateTo`, SURVEY §2.17):
  * the source group's history replays into a replica group CUT BY CUT,
  * so cross-table readers of the replica see exactly the consistent
  * states the source published — including the atomic hot/cold move,
  * which per-member replication would tear (member A at cut g, member B
  * at g−1: rows in both places or neither). Pins: every historical cut
  * matches member-for-member, the conserved-move invariant holds at
  * every REPLICA cut, replays/idle syncs no-op, the crash window
  * between member folds and the group publish re-enters exactly once,
  * and lag syncs fold only the tail. */
class GroupReplicationSpec extends AnyFunSuite with SparkFixture {

  private val keys = Map("hot" -> "k", "cold" -> "k")

  private def freshGroup(prefix: String): TxGroup =
    new TxGroup(Files.createTempDirectory(prefix).toString)

  private def keyed(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k").withColumn("v", col("k") * 10).repartition(1)
  }

  private def cutContent(g: TxGroup, name: String, v: Int): Seq[(Long, Long)] =
    g.read(spark, name, Seq("k"), Some(v))
      .select(col("k"), col("v"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().sorted.toSeq

  /** The gate shape: hot/cold split, then one transaction MOVES a band
    * from hot to cold (delete one member + append the other, one
    * publish), then hot compacts inside a third cut. */
  private def buildSource(): TxGroup = {
    val g = freshGroup("graft_grepl_src")
    val hot = g.table("hot", Seq("k"))
    val cold = g.table("cold", Seq("k"))
    g.commit(Map(
      "hot" -> hot.append(spark, keyed(0, 40)),
      "cold" -> cold.append(spark, keyed(100, 120))))           // cut 1
    val moved = hot.read(spark).filter(col("k") < 10)
    val vCold = cold.append(spark, moved)
    val vHot = hot.delete(spark, "k", 0, 9).version
    g.commit(Map("hot" -> vHot, "cold" -> vCold))               // cut 2: the move
    g.commit(Map("hot" ->                                       // cut 3: maintenance
      hot.compact(spark, smallRows = Long.MaxValue / 2).version))
    g
  }

  test("every source cut replays as a consistent replica cut, the move included") {
    val src = buildSource()
    val dst = freshGroup("graft_grepl_dst")
    assert(src.replicateTo(spark, dst, "grepl_q", keys) == 3)
    assert(dst.currentVersion == 3, "one replica cut per source cut")
    for (g <- 1 to 3; m <- Seq("hot", "cold"))
      assert(cutContent(dst, m, g) == cutContent(src, m, g),
        s"member $m diverges at cut $g")
    // the conserved-move invariant a PER-MEMBER replica cannot give: at
    // every replica cut the moved band lives in exactly one member
    for (g <- 1 to 3) {
      val inHot = cutContent(dst, "hot", g).map(_._1).count(_ < 10)
      val inCold = cutContent(dst, "cold", g).map(_._1).count(_ < 10)
      assert(inHot + inCold == 10, s"cut $g loses or duplicates moved rows")
      assert(inHot == 0 || inCold == 0 || g == 1,
        s"cut $g shows the move half-applied")
    }
  }

  test("replayed and idle syncs recognize themselves; lag syncs fold only the tail") {
    val src = buildSource()
    val dst = freshGroup("graft_grepl2_dst")
    src.replicateTo(spark, dst, "grepl_q", keys)
    val hotV = dst.table("hot", Seq("k")).currentVersion
    // idle: nothing new on the source
    assert(src.replicateTo(spark, dst, "grepl_q", keys) == 3)
    assert(dst.currentVersion == 3 &&
      dst.table("hot", Seq("k")).currentVersion == hotV,
      "idle sync must not mint versions")
    // the source moves on; only the tail folds
    val hot = src.table("hot", Seq("k"))
    src.commit(Map("hot" -> hot.append(spark, keyed(200, 220))))  // cut 4
    assert(src.replicateTo(spark, dst, "grepl_q", keys) == 4)
    assert(dst.currentVersion == 4)
    assert(cutContent(dst, "hot", 4) == cutContent(src, "hot", 4))
    assert(dst.table("hot", Seq("k")).currentVersion == hotV + 1,
      "exactly one tail fold on the hot member")
  }

  test("a replica group with commits of its own is refused, not silently misreplayed") {
    val src = buildSource()
    val dst = freshGroup("graft_grepl4_dst")
    src.replicateTo(spark, dst, "grepl_q", keys)
    // an independent writer commits to the replica group: the cut
    // alignment (replica version g mirrors source version g) is broken —
    // the resume arithmetic would replay source cut 5 under replica cut 5
    // against a state that never saw source cut 4
    val rogue = dst.table("rogue", Seq("k"))
    dst.commit(Map("rogue" -> rogue.append(spark, keyed(900, 910))))
    val hot = src.table("hot", Seq("k"))
    src.commit(Map("hot" -> hot.append(spark, keyed(400, 410))))  // source cut 4
    val ex = intercept[IllegalStateException] {
      src.replicateTo(spark, dst, "grepl_q", keys)
    }
    assert(ex.getMessage.contains("misaligned"),
      s"wanted the dedicated misalignment error, got: ${ex.getMessage}")
    // a replica AHEAD of the source is refused too (not a replica at all)
    val tiny = freshGroup("graft_grepl4_src2")
    val t = tiny.table("hot", Seq("k"))
    tiny.commit(Map("hot" -> t.append(spark, keyed(0, 5))))
    intercept[IllegalArgumentException] {
      tiny.replicateTo(spark, dst, "grepl_q", keys) // dst cut 4+ > tiny cut 1
    }
  }

  test("crash between member folds and the group publish re-enters exactly once") {
    val src = buildSource()
    val dst = freshGroup("graft_grepl3_dst")
    src.replicateTo(spark, dst, "grepl_q", keys)
    val hot = src.table("hot", Seq("k"))
    src.commit(Map("hot" -> hot.append(spark, keyed(300, 310)))) // cut 4
    // simulate the crash: cut 4's member fold lands, the publish does not
    val dstHot = dst.table("hot", Seq("k"))
    val pin = src.snapshot(Some(4))("hot")
    dstHot.applyChangeRows(spark,
      hot.rowChangesBetween(spark, src.snapshot(Some(3))("hot"), pin),
      "grepl_q", pin.toLong, "k")
    val foldedV = dstHot.currentVersion
    assert(dst.currentVersion == 3, "the cut is not yet visible")
    // re-entry: the fold no-ops on its watermark, the publish completes
    assert(src.replicateTo(spark, dst, "grepl_q", keys) == 4)
    assert(dst.currentVersion == 4)
    assert(dstHot.currentVersion == foldedV,
      "re-entry must not re-fold the member")
    assert(cutContent(dst, "hot", 4) == cutContent(src, "hot", 4))
  }
}
