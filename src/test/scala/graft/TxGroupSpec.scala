package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxGroup

/** Pins the multi-table transaction coordinator ([[graft.tables.TxGroup]],
  * SURVEY §2.17): member commits invisible until the group publish,
  * crash-window consistency, the conserved-total invariant of an atomic
  * move across EVERY group version, loser-aborts on a group commit race,
  * and group time travel. */
class TxGroupSpec extends AnyFunSuite with SparkFixture {

  private def freshGroup(): TxGroup =
    new TxGroup(Files.createTempDirectory("graft_txgroup").toString)

  private def keyed(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k").withColumn("v", col("k") * 10).repartition(1)
  }

  private def keysOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq

  test("member commits become visible together at the group publish, never before") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    val vA = a.append(spark, keyed(0, 50))
    val vB = b.append(spark, keyed(100, 150))
    // both members durably committed in their OWN logs, group still empty
    assert(a.currentVersion == 1 && b.currentVersion == 1)
    assert(g.currentVersion == 0)
    intercept[IllegalArgumentException] { g.read(spark, "a", Seq("k")) }
    assert(g.commit(Map("a" -> vA, "b" -> vB)) == 1)
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (0L until 50L))
    assert(keysOf(g.read(spark, "b", Seq("k"))) == (100L until 150L))
  }

  test("a crash between member commits and the group publish leaves the group view unchanged; re-publish recovers") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    g.commit(Map(
      "a" -> a.append(spark, keyed(0, 50)),
      "b" -> b.append(spark, keyed(100, 150))))
    // the transaction: move k < 25 from a to b... and "crash" before the
    // group publish (both member commits land, the group link does not)
    val moved = a.read(spark).filter(col("k") < 25)
    val vB2 = b.append(spark, moved)
    val dA = a.delete(spark, "k", 0, 24)
    // group readers still see the ORIGINAL cut — neither duplicated nor
    // lost rows, even though both member tables have moved on
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (0L until 50L))
    assert(keysOf(g.read(spark, "b", Seq("k"))) == (100L until 150L))
    // recovery: the coordinator re-publishes the already-durable member
    // versions; the transaction completes exactly once
    g.commit(Map("a" -> dA.version, "b" -> vB2))
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (25L until 50L))
    assert(keysOf(g.read(spark, "b", Seq("k"))) ==
      ((0L until 25L) ++ (100L until 150L)))
  }

  test("every group version is a consistent cut: the moved total is conserved, no dup, no loss") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 80)),
      "b" -> b.append(spark, keyed(100, 120))))
    def move(lo: Long, hi: Long): Unit = {
      val moved = a.read(spark).filter(col("k") >= lo && col("k") <= hi)
      val vB = b.append(spark, moved)
      val dA = a.delete(spark, "k", lo, hi)
      g.commit(Map("a" -> dA.version, "b" -> vB))
    }
    move(0, 19)  // group v2
    move(40, 49) // group v3
    val expected = ((0L until 80L) ++ (100L until 120L)).sorted
    (1 to g.currentVersion).foreach { v =>
      val cut = keysOf(g.read(spark, "a", Seq("k"), Some(v))) ++
        keysOf(g.read(spark, "b", Seq("k"), Some(v)))
      assert(cut.sorted == expected,
        s"group version $v is not a consistent cut")
    }
    // and the final cut really moved the bands
    assert(keysOf(g.read(spark, "a", Seq("k"))) == ((20L until 40L) ++ (50L until 80L)))
  }

  test("a group commit that loses the race aborts instead of interleaving pins") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 10))))
    val base = g.currentVersion
    // competing transaction lands group v2 between our base-read and publish
    val vA2 = a.append(spark, keyed(10, 20))
    g.commit(Map("a" -> vA2))
    val vA3 = a.append(spark, keyed(20, 30))
    intercept[java.util.ConcurrentModificationException] {
      g.commitFrom(base, Map("a" -> vA3))
    }
    // the losing transaction published nothing: the group still pins v2's cut
    assert(g.currentVersion == base + 1)
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (0L until 20L))
  }

  test("group time travel replays a historical cut even after members moved on") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 30)),
      "b" -> b.append(spark, keyed(100, 110))))
    val moved = a.read(spark).filter(col("k") < 10)
    val vB2 = b.append(spark, moved)
    val dA = a.delete(spark, "k", 0, 9)
    g.commit(Map("a" -> dA.version, "b" -> vB2))
    // v1's cut is intact although member a's own latest is the post-delete
    assert(keysOf(g.read(spark, "a", Seq("k"), Some(1))) == (0L until 30L))
    assert(keysOf(g.read(spark, "b", Seq("k"), Some(1))) == (100L until 110L))
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (10L until 30L))
  }

  test("group vacuum reclaims past the horizon without breaking any retained cut") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 80)),
      "b" -> b.append(spark, keyed(100, 120))))
    def move(lo: Long, hi: Long): Unit = {
      val moved = a.read(spark).filter(col("k") >= lo && col("k") <= hi)
      val vB = b.append(spark, moved)
      val dA = a.delete(spark, "k", lo, hi)
      g.commit(Map("a" -> dA.version, "b" -> vB))
    }
    move(0, 19); move(40, 49) // group v2, v3
    val (deleted, dropped) = g.vacuum(retainGroupVersions = 2)
    assert(dropped == 1, "exactly group v1 expires")
    assert(deleted >= 1, "v1's superseded member data should be reclaimed")
    // the expired cut is gone...
    intercept[IllegalArgumentException] { g.read(spark, "a", Seq("k"), Some(1)) }
    // ...but every RETAINED cut is fully readable, members included
    val expected = ((0L until 80L) ++ (100L until 120L)).sorted
    (2 to 3).foreach { v =>
      val cut = keysOf(g.read(spark, "a", Seq("k"), Some(v))) ++
        keysOf(g.read(spark, "b", Seq("k"), Some(v)))
      assert(cut.sorted == expected, s"retained group cut $v broke")
    }
    // idempotent: nothing left to reclaim at the same horizon
    assert(g.vacuum(2) == (0, 0))
  }

  test("the hazard group vacuum exists for: a naive member-level vacuum strands a pinned group cut") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 10))))
    g.commit(Map("a" -> a.append(spark, keyed(10, 20))))
    // member-level retention ignores the group's pins entirely
    a.vacuum(retainVersions = 1)
    // group v1 pins member version 1, whose manifest is now gone
    intercept[IllegalArgumentException] { g.read(spark, "a", Seq("k"), Some(1)) }
    // the latest cut still works — only history was stranded
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (0L until 20L))
  }

  test("q_table_multi's gate build: the group pins exactly two versions, the move is visible only at v2") {
    val root = Files.createTempDirectory("graft_txgroup_gate").toString
    // replicate the gate build shape on constructed data: split then move
    val g = new TxGroup(root)
    val hot = g.table("hot", Seq("k"))
    val cold = g.table("cold", Seq("k"))
    g.commit(Map("hot" -> hot.append(spark, keyed(0, 10)),
      "cold" -> cold.append(spark, keyed(10, 20))))
    val moved = hot.read(spark).filter(col("k") >= 2 && col("k") <= 4)
    val vC = cold.append(spark, moved)
    val dH = hot.delete(spark, "k", 2, 4)
    g.commit(Map("hot" -> dH.version, "cold" -> vC))
    assert(g.currentVersion == 2)
    assert(keysOf(g.read(spark, "hot", Seq("k"), Some(1))) == (0L until 10L))
    assert(keysOf(g.read(spark, "hot", Seq("k"))) ==
      (0L until 10L).filterNot(k => k >= 2 && k <= 4))
    assert(keysOf(g.read(spark, "cold", Seq("k"))) ==
      ((2L to 4L) ++ (10L until 20L)))
  }

  test("group restore rewinds every member to the cut ATOMICALLY; histories survive") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 10)),
      "b" -> b.append(spark, keyed(100, 110))))           // cut 1
    g.commit(Map("a" -> a.append(spark, keyed(10, 20)),
      "b" -> b.delete(spark, "k", 100, 104).version))     // cut 2: the bad cut
    val vg = g.restoreTo(1)
    assert(vg == 3, "group restore must be a new group commit")
    // both members rewound together — the cut-1 world, atomically
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (0L until 10L))
    assert(keysOf(g.read(spark, "b", Seq("k"))) == (100L until 110L))
    // nothing rewritten: the abandoned cut is still time-travelable
    assert(keysOf(g.read(spark, "a", Seq("k"), Some(2))) == (0L until 20L))
    assert(keysOf(g.read(spark, "b", Seq("k"), Some(2))) == (105L until 110L))
    // and the group keeps moving normally afterwards
    g.commit(Map("a" -> a.append(spark, keyed(30, 35))))
    assert(keysOf(g.read(spark, "a", Seq("k"))) == ((0L until 10L) ++ (30L until 35L)))
  }

  test("group restore empties a member that joined AFTER the target cut (no invented cuts)") {
    val g = freshGroup()
    val a = g.table("a", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 10))))   // cut 1: only a
    val late = g.table("late", Seq("k"))
    g.commit(Map("late" -> late.append(spark, keyed(50, 60)))) // cut 2: late joins
    g.restoreTo(1)
    assert(keysOf(g.read(spark, "a", Seq("k"))) == (0L until 10L))
    // the cut-1 world had no 'late' rows; it stays a member, pinned at an
    // EMPTY version — the group read surfaces the documented empty-table
    // error (schema-less), never the post-cut rows
    val e = intercept[IllegalStateException] { g.read(spark, "late", Seq("k")) }
    assert(e.getMessage.contains("empty at version"))
    // its own history is intact — the pre-restore rows are still travelable
    assert(keysOf(late.read(spark, Some(1))) == (50L until 60L))
  }
}
