package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Shallow-clone contract ([[TxTable.cloneTo]], Delta `SHALLOW CLONE`
  * semantics): metadata-only creation, read equality at the clone point,
  * divergence isolation in BOTH directions (clone mutations invisible to
  * the source, source commits invisible to the clone), copy-on-write
  * rewrite of borrowed entries into clone-local files, the vacuum
  * ownership guard (borrowed absolute entries are never reclaimed by the
  * clone), constraint carry-over, and loud refusals. */
class TxCloneSpec extends AnyFunSuite with SparkFixture {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_txclone").toString

  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(parts, col("k"))
  }

  private def rows(t: TxTable): Seq[(Long, Long)] =
    t.read(spark).select(col("k"), col("v"))
      .as[(Long, Long)](spark.implicits.newProductEncoder).collect().toSeq.sorted

  private def dataFiles(root: String): Set[String] =
    Option(Paths.get(root, "data").toFile.listFiles())
      .getOrElse(Array.empty).map(_.getName).filterNot(_.startsWith(".")).toSet

  test("clone is metadata-only and reads equal the source at the clone point") {
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 100, 4))
    src.append(spark, keyed(100, 120, 1))
    val clone = src.cloneTo(tmpRoot() + "/c")
    assert(dataFiles(clone.root).isEmpty,
      "shallow clone must copy ZERO data files")
    assert(rows(clone) == rows(src))
    assert(clone.currentVersion == 1, "clone starts at its own v1")
  }

  test("clone mutations are invisible to the source; borrowed entries rewrite copy-on-write") {
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 100, 4))
    val before = dataFiles(src.root)
    val clone = src.cloneTo(tmpRoot() + "/c")
    clone.delete(spark, "k", 10, 39)
    assert(rows(clone) == (0L until 100L).filterNot(k => k >= 10 && k <= 39)
      .map(k => (k, k * 10)))
    assert(rows(src) == (0L until 100L).map(k => (k, k * 10)),
      "source must not see the clone's delete")
    assert(dataFiles(src.root) == before,
      "the copy-on-write rewrite must land in the CLONE's data dir")
    assert(dataFiles(clone.root).nonEmpty,
      "kept rows of touched borrowed files materialize clone-locally")
  }

  test("source commits after the clone point are invisible to the clone") {
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 50, 2))
    val clone = src.cloneTo(tmpRoot() + "/c")
    src.append(spark, keyed(50, 80, 1))
    assert(rows(clone) == (0L until 50L).map(k => (k, k * 10)),
      "the clone is pinned to its clone-point state")
  }

  test("vacuum on the clone never reclaims borrowed source files") {
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 100, 4))
    val srcFiles = dataFiles(src.root)
    val clone = src.cloneTo(tmpRoot() + "/c")
    clone.delete(spark, "k", 10, 39)  // clone v2: rewrites borrowed entries
    clone.delete(spark, "k", 40, 69)  // clone v3: supersedes v2 state
    val (reclaimed, expired) = clone.vacuum(retainVersions = 1)
    assert(expired == 2)
    assert(dataFiles(src.root) == srcFiles,
      s"clone vacuum touched source files (reclaimed $reclaimed)")
    assert(rows(clone) == (0L until 100L).filterNot(k => k >= 10 && k <= 69)
      .map(k => (k, k * 10)))
  }

  test("constraints carry over to the clone; txn watermarks do not") {
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 10, 1))
    src.addConstraint(spark, "v >= 0")
    val clone = src.cloneTo(tmpRoot() + "/c")
    import spark.implicits._
    val bad = Seq((200L, -5L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      clone.append(spark, bad)
    }
    assert(e.getMessage.contains("v >= 0"), s"constraint must travel: ${e.getMessage}")
    assert(clone.snapshot().txns.isEmpty, "idempotent-writer watermarks start fresh")
  }

  test("clone refuses an empty source and a non-empty target") {
    val empty = new TxTable(tmpRoot(), Seq("k"))
    intercept[IllegalArgumentException] { empty.cloneTo(tmpRoot() + "/c") }
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 5, 1))
    val taken = new TxTable(tmpRoot() + "/t", Seq("k"))
    taken.append(spark, keyed(0, 3, 1))
    intercept[IllegalArgumentException] { src.cloneTo(taken.root) }
  }

  test("a fully-borrowed clone reports its real byte size to Catalyst, never ~0") {
    // borrowed manifest entries are ABSOLUTE paths; the stats seam must
    // resolve them the way reads do, or a 100 TB clone would report
    // sizeInBytes≈0 and plan as the BROADCAST side of a join (round-10
    // ADVICE). The source's physical bytes are the floor.
    val src = new TxTable(tmpRoot(), Seq("k"))
    src.append(spark, keyed(0, 5000, 4))
    val srcBytes = Option(Paths.get(src.root, "data").toFile.listFiles())
      .getOrElse(Array.empty).filterNot(_.getName.startsWith(".")).map(_.length()).sum
    assert(srcBytes > 0)
    val clone = src.cloneTo(tmpRoot() + "/c")
    val snap = clone.snapshot()
    val schema = clone.read(spark).schema
    val scan = new graft.sources.TxV1Scan(clone, snap.files, snap.colMap, schema, schema)
    val sz = scan.estimateStatistics().sizeInBytes()
    assert(sz.isPresent && sz.getAsLong >= srcBytes,
      s"clone stats ${if (sz.isPresent) sz.getAsLong else -1} < source bytes $srcBytes")
  }
}
