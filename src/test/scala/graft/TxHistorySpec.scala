package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** DESCRIBE HISTORY contract ([[TxTable.history]]): every commit path
  * records its operation name; history reads newest-first from the
  * retained delta manifests with zero data I/O; vacuum bounds the
  * window exactly like Delta's retention does. */
class TxHistorySpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): TxTable =
    new TxTable(Files.createTempDirectory("graft_history").toString, Seq("k"))

  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(parts, col("k"))
  }

  test("every commit path records its operation; history reads newest first") {
    import spark.implicits._
    val t = freshTable()
    t.append(spark, keyed(0, 100, 4))                       // v1 append (4 files)
    t.delete(spark, "k", 0, 24)                             // v2 delete
    t.renameColumn("v", "amount")                           // v3 rename-column
    t.merge(spark, Seq((5L, 999L)).toDF("k", "amount"), "k") // v4 merge
    t.compact(spark, smallRows = 1000)                      // v5 compaction
    t.restore(2)                                            // v6 restore
    t.appendBatch(spark, keyed(200, 210, 1), "appX", 1)     // v7 stream-append
    val h = t.history()
    assert(h.map(_.version) == Seq(7, 6, 5, 4, 3, 2, 1), "newest first")
    assert(h.map(_.operation) == Seq("stream-append", "restore(2)",
      "compaction", "merge", "rename-column", "delete", "append"),
      s"got ${h.map(_.operation)}")
    // file-level footprint: the append added 4 files and removed none;
    // the metadata-only rename touched no files at all
    val byV = h.map(i => i.version -> i).toMap
    assert(byV(1).addedFiles == 4 && byV(1).removedFiles == 0)
    assert(byV(3).addedFiles == 0 && byV(3).removedFiles == 0)
    assert(h.forall(_.timestampMs > 0))
  }

  test("constraint and column ops are audit-visible") {
    val t = freshTable()
    t.append(spark, keyed(0, 10, 1))
    t.addConstraint(spark, "v >= 0")
    t.dropConstraint(spark, "v >= 0")
    t.dropColumn("v")
    t.evolveStats(spark, Seq("k"))
    assert(t.history().map(_.operation) == Seq("evolve-stats", "drop-column",
      "drop-constraint", "add-constraint", "append"))
  }

  test("a clone's v1 names its source; later commits log normally") {
    val t = freshTable()
    t.append(spark, keyed(0, 20, 2))
    val clone = t.cloneTo(Files.createTempDirectory("graft_historyclone").toString + "/c")
    clone.append(spark, keyed(20, 25, 1))
    val h = clone.history()
    assert(h.map(_.operation).last.startsWith("clone("), s"got ${h.map(_.operation)}")
    assert(h.head.operation == "append")
    assert(h.last.addedFiles == 2, "clone v1 borrows the source's 2 files as adds")
  }

  test("group history composes member op-logs: pins, movers, and their operations") {
    import graft.tables.TxGroup
    val g = new TxGroup(Files.createTempDirectory("graft_grouphist").toString)
    val a = g.table("a", Seq("k"))
    val b = g.table("b", Seq("k"))
    g.commit(Map("a" -> a.append(spark, keyed(0, 50, 1)),
      "b" -> b.append(spark, keyed(100, 150, 1))))      // cut 1: both appear
    // the move transaction: delete from a, append to b, one atomic cut
    val vB = b.append(spark, a.read(spark).filter(col("k") < 25))
    val vA = a.delete(spark, "k", 0, 24).version
    g.commit(Map("a" -> vA, "b" -> vB))                 // cut 2: both move
    g.commit(Map("b" -> b.compact(spark, 1000).version)) // cut 3: b only
    val h = g.history()
    assert(h.map(_.version) == Seq(3, 2, 1), "newest first")
    assert(h(0).changed == Map("b" -> "compaction"), s"got ${h(0).changed}")
    assert(h(1).changed == Map("a" -> "delete", "b" -> "append"))
    assert(h(2).changed == Map("a" -> "append", "b" -> "append"))
    assert(h(0).pins == Map("a" -> 2, "b" -> 3))
    assert(h.forall(_.timestampMs > 0))
  }

  test("detail summarizes the operating state: footprint, schema ops, DVs, tags") {
    val t = freshTable()
    // a real note column: dropColumn validates existence (footer-checked),
    // so the dropped-column summary must be earned by actual data
    t.append(spark, keyed(0, 100, 4)
      .withColumn("note", concat(lit("n"), col("k"))))
    t.renameColumn("v", "amount")
    t.dropColumn("note")
    t.addConstraint(spark, "amount >= 0")
    t.deletePositional(spark, "k", 0, 0) // one DV, zero rewrites
    t.tag("audit", 2)
    val d = t.detail()
    assert(d.version == t.currentVersion)
    assert(d.numFiles == 4 && d.rows == 100)
    assert(d.sizeBytes > 0, "byte footprint must come from the real files")
    assert(d.statColumns == Seq("k"))
    assert(d.constraints == Seq("amount >= 0") || d.constraints.exists(_.contains("v")),
      s"stored constraint missing: ${d.constraints}")
    assert(d.renamedColumns == Map("amount" -> "v"))
    assert(d.droppedColumns == Set("note"))
    assert(d.numDeletionVectors == 1)
    assert(d.tags == Map("audit" -> 2))
  }

  test("time-based vacuum expires by the same envelope clock time travel uses") {
    val t = freshTable()
    t.clockMs = () => 1000L
    t.append(spark, keyed(0, 10, 1))   // v1 @ 1000
    t.clockMs = () => 2000L
    t.append(spark, keyed(10, 20, 1))  // v2 @ 2000
    t.clockMs = () => 3000L
    t.append(spark, keyed(20, 30, 1))  // v3 @ 3000
    val (files1, vers1) = t.vacuumOlderThan(2000L) // v1 expires, v2+v3 stay
    assert(vers1 == 1, s"expected exactly v1 expired, got $vers1")
    assert(files1 == 0, "append-only history: v1's file is still live in v2/v3")
    assert(t.read(spark, Some(2)).count() == 20, "v2 must still reconstruct")
    assert(t.history().map(_.version) == Seq(3, 2))
    // a horizon past everything keeps only the current version
    val (_, vers2) = t.vacuumOlderThan(9999L)
    assert(vers2 == 1, "v2 expires; v3 (current) is always retained")
    assert(t.read(spark).count() == 30)
  }

  test("vacuum bounds the audit window; retained history still reads") {
    val t = freshTable()
    (0 until 12).foreach(i => t.append(spark, keyed(i * 10L, i * 10L + 10, 1)))
    val full = t.history()
    assert(full.size == 12)
    t.vacuum(retainVersions = 3)
    val trimmed = t.history()
    assert(trimmed.nonEmpty && trimmed.size < full.size,
      s"vacuum must shrink the window, got ${trimmed.size} of ${full.size}")
    assert(trimmed.forall(_.operation == "append"))
    assert(t.read(spark).count() == 120, "data unaffected by log trimming")
  }
}
