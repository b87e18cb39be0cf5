package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** DROP COLUMN / DROP CONSTRAINT contract ([[TxTable.dropColumn]],
  * Delta column-mapping semantics): metadata-only drop, physical data
  * untouched on disk, per-version visibility under time travel, the
  * reserved-name resurrection guard, the loud logical-surface refusals,
  * rename interplay, CDC and clone carry-through, and the
  * constraint-reference guard with its [[TxTable.dropConstraint]]
  * escape hatch. */
class TxDropColumnSpec extends AnyFunSuite with SparkFixture {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_txdrop").toString

  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .withColumn("note", concat(lit("n"), col("k")))
      .repartitionByRange(parts, col("k"))
  }

  private def dataFileNames(root: String): Set[String] =
    Option(Paths.get(root, "data").toFile.listFiles())
      .getOrElse(Array.empty).map(_.getName).filterNot(_.startsWith(".")).toSet

  test("drop is metadata-only: column hidden, zero files written, rest intact") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 50, 2))
    val before = dataFileNames(t.root)
    val v = t.dropColumn("note")
    assert(v == 2)
    assert(dataFileNames(t.root) == before, "drop must write no data files")
    val got = t.read(spark)
    assert(got.columns.toSeq.sorted == Seq("k", "v"))
    assert(got.agg(sum(col("v"))).head().getLong(0) == (0L until 50L).map(_ * 10).sum)
    // on disk the physical column is still there — drop changed visibility only
    val raw = spark.read.option("mergeSchema", "true").parquet(s"${t.root}/data")
    assert(raw.columns.contains("note"), "physical data must be untouched")
  }

  test("time travel shows the column at pre-drop versions only") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1)) // v1
    t.dropColumn("note")             // v2
    assert(t.read(spark, Some(1)).columns.contains("note"))
    assert(!t.read(spark, Some(2)).columns.contains("note"))
  }

  test("appends after the drop omit the column; carrying it is rejected loudly") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1))
    t.dropColumn("note")
    t.append(spark, Seq((100L, 7L)).toDF("k", "v")) // fine: no dropped column
    assert(t.read(spark).count() == 11)
    val e = intercept[IllegalArgumentException] {
      t.append(spark, Seq((200L, 8L, "boo")).toDF("k", "v", "note"))
    }
    assert(e.getMessage.contains("reserved"),
      s"resurrection must be refused by name, got: ${e.getMessage}")
  }

  test("logical surface fails loudly on a dropped column; other probes keep working") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 100, 4))
    // drop the VALUE column through a handle that doesn't stat-declare it
    t.dropColumn("v")
    intercept[IllegalArgumentException] { t.readWhere(spark, "v", 0, 10) }
    intercept[IllegalArgumentException] { t.delete(spark, "v", 0, 10) }
    val pruned = t.readWhere(spark, "k", 10, 19) // untouched columns still prune
    assert(pruned.filesScanned < pruned.filesTotal)
    assert(pruned.df.count() == 10)
  }

  test("stat/bloom-declared columns refuse to drop through this handle") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1))
    val e = intercept[IllegalArgumentException] { t.dropColumn("k") }
    assert(e.getMessage.contains("stat"))
    // a handle that does NOT declare it may drop it
    val t2 = new TxTable(t.root, Nil)
    t2.dropColumn("k")
    assert(!t2.read(spark).columns.contains("k"))
  }

  test("drop after rename tombstones the PHYSICAL name; the logical name is reusable") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))
    t.renameColumn("v", "amount")
    t.dropColumn("amount")
    val cols = t.read(spark).columns.toSeq
    assert(!cols.contains("v") && !cols.contains("amount"), s"got $cols")
    // the PHYSICAL name is reserved: not a rename source, not droppable again
    intercept[IllegalArgumentException] { t.renameColumn("v", "x") }
    intercept[IllegalArgumentException] { t.dropColumn("v") } // already gone
    // the LOGICAL name is free again — Delta's fresh-physical semantics:
    // a re-added `amount` is a NEW physical column; old `v` values stay hidden
    t.append(spark, Seq((100L, 42L, "late")).toDF("k", "amount", "note"))
    val back = t.read(spark)
    assert(back.columns.contains("amount") && !back.columns.contains("v"))
    assert(back.agg(sum(col("amount"))).head().getLong(0) == 42L,
      "pre-drop values must NOT resurrect into the re-added column")
  }

  test("CDC across a drop reads the whole feed under the target mapping") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))  // v1
    t.dropColumn("note")             // v2 (metadata-only: no change rows)
    t.append(spark, Seq((50L, 9L)).toDF("k", "v")) // v3
    val feed = t.rowChangesBetween(spark, 0, 3)
    assert(!feed.columns.contains("note"))
    assert(feed.count() == 6, "5 v1 inserts + 1 v3 insert, drop adds none")
  }

  test("clone carries the tombstone; compaction materializes the drop") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 30, 3))
    t.dropColumn("note")
    val clone = t.cloneTo(tmpRoot() + "/c")
    assert(!clone.read(spark).columns.contains("note"), "clone inherits the drop")
    t.compact(spark, smallRows = 1000)
    assert(!t.read(spark).columns.contains("note"))
    assert(t.read(spark).count() == 30)
    // the CURRENT manifest's files no longer carry the physical column at
    // all (pre-compaction files stay on disk for time travel until vacuum)
    val raw = spark.read.option("mergeSchema", "true").parquet(
      t.snapshot().files.map(f => s"${t.root}/data/${f.path}"): _*)
    assert(!raw.columns.contains("note"),
      "compaction rewrites through the logical surface — the drop becomes physical")
  }

  test("purge rewrites ONLY the files still carrying the dropped column") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 30, 3))                  // 3 pre-drop files carry `note`
    t.dropColumn("note")
    t.append(spark, Seq((100L, 7L)).toDF("k", "v"))   // post-drop file: no `note`
    val before = t.snapshot().files.map(_.path).toSet
    val r = t.purgeDroppedColumns(spark)
    assert(r.rewrittenFiles == 3 && r.keptFiles == 1,
      s"only the 3 carriers rewrite, got $r")
    val after = t.snapshot()
    // the clean post-drop file survives BY NAME; the carriers are gone
    assert((before intersect after.files.map(_.path).toSet).size == 1)
    // the dropped bytes have physically left the CURRENT files
    val raw = spark.read.option("mergeSchema", "true").parquet(
      after.files.map(f => s"${t.root}/data/${f.path}"): _*)
    assert(!raw.columns.contains("note"), "purge must remove the physical column")
    assert(t.read(spark).count() == 31)
    assert(t.history().head.operation == "purge-dropped-columns")
    // idempotent: a second purge finds nothing to rewrite
    val r2 = t.purgeDroppedColumns(spark)
    assert(r2.rewrittenFiles == 0 && r2.version == after.version)
  }

  test("a CHECK constraint blocks the drop until dropConstraint releases it") {
    import spark.implicits._
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))
    t.addConstraint(spark, "v >= 0")
    val e = intercept[IllegalArgumentException] { t.dropColumn("v") }
    assert(e.getMessage.contains("CHECK"))
    t.dropConstraint(spark, "v >= 0")
    t.dropColumn("v")
    assert(!t.read(spark).columns.contains("v"))
    // and the released constraint no longer fires
    val t2 = new TxTable(t.root, Seq("k"))
    t2.append(spark, Seq((9L, "late")).toDF("k", "note2"))
    assert(t2.read(spark).count() == 6)
  }

  test("dropConstraint resolves through the current mapping and refuses unknowns") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 5, 1))
    t.addConstraint(spark, "v >= 0")        // stored physical: v
    t.renameColumn("v", "amount")
    t.dropConstraint(spark, "amount >= 0")  // current logical spelling finds it
    assert(t.snapshot().constraints.isEmpty)
    intercept[IllegalArgumentException] { t.dropConstraint(spark, "amount >= 0") }
  }

  test("rename onto a dropped (tombstoned) physical name is rejected") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1))
    t.dropColumn("v")
    // without the guard this commits, readFiles renames note->v alongside
    // the hidden physical v, and the tombstone drop removes BOTH columns
    // named v — silent data loss on every read
    val e = intercept[IllegalArgumentException] { t.renameColumn("note", "v") }
    assert(e.getMessage.contains("reserved"))
    // the table is untouched: note still reads, data intact
    val got = t.read(spark)
    assert(got.columns.toSeq.sorted == Seq("k", "note"))
    assert(got.count() == 10)
  }

  test("dropping a column no current file carries is rejected (typo guard)") {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, keyed(0, 10, 1))
    // 'vv' matches no logical, no stats-known physical, no parquet footer
    val e = intercept[IllegalArgumentException] { t.dropColumn("vv") }
    assert(e.getMessage.contains("no current file carries it"))
    // nothing was committed or reserved: the name is still appendable
    import spark.implicits._
    val t2 = new TxTable(t.root, Seq("k"))
    t2.append(spark, Seq((99L, 1L)).toDF("k", "vv"))
    assert(t2.read(spark).columns.contains("vv"))
    // and a stats-unknown but footer-carried column still drops fine
    t2.dropColumn("vv")
    assert(!t2.read(spark).columns.contains("vv"))
  }
}
