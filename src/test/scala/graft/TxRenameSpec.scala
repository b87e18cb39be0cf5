package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Column-mapping contract ([[TxTable.renameColumn]], the Delta/Iceberg
  * rename-without-rewrite): metadata-only rename, logical reads/writes
  * over a stable physical file schema, stat pruning surviving the
  * rename, per-version mappings under time travel, CDC under the target
  * mapping, mapping carry-through on clone, and loud refusals. */
class TxRenameSpec extends AnyFunSuite with SparkFixture {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_txrename").toString

  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(parts, col("k"))
  }

  private def dataFileNames(root: String): Set[String] =
    Option(Paths.get(root, "data").toFile.listFiles())
      .getOrElse(Array.empty).map(_.getName).filterNot(_.startsWith(".")).toSet

  test("rename is metadata-only: new logical name, same values, zero files written") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 50, 2))
    val before = dataFileNames(t.root)
    val v = t.renameColumn("v", "amount")
    assert(v == 2)
    assert(dataFileNames(t.root) == before, "rename must write no data files")
    val got = t.read(spark)
    assert(got.columns.toSeq.sorted == Seq("amount", "k"))
    assert(got.agg(sum(col("amount"))).head().getLong(0) == (0L until 50L).map(_ * 10).sum)
  }

  test("writes after the rename use the logical name; old and new files read as one") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1))
    t.renameColumn("v", "amount")
    t.append(spark, Seq((100L, 7L)).toDF("k", "amount"))
    val got = t.read(spark).select(col("k"), col("amount"))
      .as[(Long, Long)](spark.implicits.newProductEncoder).collect().toSeq.sorted
    assert(got == ((0L until 10L).map(k => (k, k * 10)) :+ (100L, 7L)))
    // on disk, EVERY file carries the physical name: a raw read sees `v`
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"${t.root}/data")
    assert(raw.columns.contains("v") && !raw.columns.contains("amount"),
      s"staged files must keep the physical schema, got ${raw.columns.toSeq}")
  }

  test("stat pruning answers through the renamed column") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 100, 4))
    t.renameColumn("k", "id")
    val pruned = t.readWhere(spark, "id", 10, 19)
    assert(pruned.filesScanned < pruned.filesTotal, "stats must still prune")
    assert(pruned.df.count() == 10)
    val d = t.delete(spark, "id", 0, 24)
    assert(d.droppedFiles + d.rewrittenFiles > 0)
    assert(t.read(spark).count() == 75)
  }

  test("time travel shows each version under its own mapping") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1)) // v1
    t.renameColumn("v", "amount")    // v2
    assert(t.read(spark, Some(1)).columns.contains("v"))
    assert(t.read(spark, Some(2)).columns.contains("amount"))
  }

  test("CDC across a rename reads the whole feed under the target mapping") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))   // v1
    t.renameColumn("v", "amount")     // v2 (metadata-only: no change rows)
    t.append(spark, Seq((50L, 9L)).toDF("k", "amount")) // v3
    val feed = t.rowChangesBetween(spark, 0, 3)
    assert(feed.columns.contains("amount") && !feed.columns.contains("v"))
    assert(feed.count() == 6, "5 v1 inserts + 1 v3 insert, rename adds none")
  }

  test("rename back to the physical name drops the mapping; clone carries it") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))
    t.renameColumn("v", "amount")
    assert(t.snapshot().colMap == Map("amount" -> "v"))
    val clone = t.cloneTo(tmpRoot() + "/c")
    assert(clone.read(spark).columns.contains("amount"), "clone inherits the mapping")
    t.renameColumn("amount", "v")
    assert(t.snapshot().colMap.isEmpty, "identity mapping is dropped, not stored")
  }

  test("constraints declared after a rename translate to physical terms and enforce") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))
    t.renameColumn("v", "amount")
    t.addConstraint(spark, "amount >= 0")
    val e = intercept[IllegalArgumentException] {
      t.append(spark, Seq((9L, -1L)).toDF("k", "amount"))
    }
    assert(e.getMessage.toLowerCase.contains("v"),
      s"stored (physical) constraint must fire: ${e.getMessage}")
  }

  test("refusals: colliding targets and renamed-away sources") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))
    t.renameColumn("v", "amount")
    intercept[IllegalArgumentException] { t.renameColumn("v", "x") } // v renamed away
    intercept[IllegalArgumentException] { t.renameColumn("k", "amount") } // taken (logical)
    intercept[IllegalArgumentException] { t.renameColumn("amount", "k") } // taken (physical)
    intercept[IllegalArgumentException] { t.renameColumn("amount", "amount") }
  }
}
