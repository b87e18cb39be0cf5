package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** RESTORE contract ([[graft.tables.TxTable.restore]]): a metadata-only
  * commit that makes an earlier version's data state current while
  * keeping history, stream watermarks, constraints, and CDF honesty. */
class RestoreSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): TxTable =
    new TxTable(Files.createTempDirectory("graft_restore").toString, Seq("k"))

  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(parts, col("k"))
  }

  private def ks(t: TxTable, v: Option[Int] = None): Seq[Long] = {
    import spark.implicits._
    t.read(spark, v).select("k").as[Long].collect().toSeq.sorted
  }

  test("restore rewinds data state as a NEW version; history stays travelable") {
    val t = freshTable()
    t.append(spark, keyed(0, 100, 2))   // v1
    t.append(spark, keyed(100, 150, 1)) // v2
    t.delete(spark, "k", 0, 49)         // v3: the bad commit
    assert(ks(t) == (50L until 150L))
    val v = t.restore(2)
    assert(v == 4, "restore must be a fresh commit, not a history rewrite")
    assert(ks(t) == (0L until 150L), "restored state must equal version 2 exactly")
    // the bad version is still there for audit
    assert(ks(t, Some(3)) == (50L until 150L))
    // and history continues normally after the restore
    t.append(spark, keyed(150, 160, 1)) // v5
    assert(ks(t) == (0L until 160L))
  }

  test("restore is metadata-only: no data files are written or copied") {
    val t = freshTable()
    t.append(spark, keyed(0, 100, 4))
    t.delete(spark, "k", 10, 19)
    val dataFiles = java.nio.file.Paths.get(t.root, "data").toFile.listFiles().length
    t.restore(1)
    assert(java.nio.file.Paths.get(t.root, "data").toFile.listFiles().length
      == dataFiles, "restore wrote/copied data files — it must only commit metadata")
  }

  test("CDF across a restore reports the honest add/remove diff, so replicas follow") {
    val t = freshTable()
    t.append(spark, keyed(0, 50, 1))  // v1
    t.delete(spark, "k", 0, 24)       // v2 (full-file rewrite or drop)
    val vr = t.restore(1)             // v3: the deleted rows come back
    val changes = t.rowChangesBetween(spark, vr - 1, vr) // fromV exclusive
    import spark.implicits._
    val inserted = changes.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().toSeq.sorted
    // the restored state re-adds the pre-delete file; the post-delete
    // rewrite leaves — net row-level truth: the deleted band is back
    assert(inserted.containsSlice(0L to 24L),
      s"restore CDF must re-insert the un-deleted band, got $inserted")
  }

  test("restore refuses loudly when the target version's files are gone") {
    // vacuum drops expired MANIFESTS with their files, so a vacuumed
    // version already fails the version-exists check; the file-existence
    // guard defends the other hole — a version still reconstructible from
    // the log whose data files were lost out-of-band (partial storage
    // loss, an over-eager external cleaner). A partial restore would
    // silently resurrect a subset of the old table.
    val t = freshTable()
    t.append(spark, keyed(0, 50, 1))       // v1
    t.overwrite(spark, keyed(50, 90, 1))   // v2: v1's file now unreferenced
    val gone = t.snapshot(Some(1)).files.head.path
    Files.delete(java.nio.file.Paths.get(t.root, "data").resolve(gone))
    val e = intercept[IllegalArgumentException](t.restore(1))
    assert(e.getMessage.contains("no longer materializable"),
      s"expected a loud missing-files refusal, got: ${e.getMessage}")
    // and the vacuumed case fails the version-exists check, also loudly
    t.append(spark, keyed(90, 95, 1))      // v3
    t.vacuum(retainVersions = 2)
    val e2 = intercept[IllegalArgumentException](t.restore(1))
    assert(e2.getMessage.contains("does not exist"))
  }

  test("restore is FULL-state: pre-drop restore resurfaces the column (undrop)") {
    val t = freshTable()
    t.append(spark, keyed(0, 10, 1)) // v1
    t.dropColumn("v")                // v2
    assert(!t.read(spark).columns.contains("v"))
    t.restore(1)                     // v3: the undrop path
    val back = t.read(spark)
    assert(back.columns.contains("v"), "restore past a drop must resurface the column")
    assert(back.agg(sum(col("v"))).head().getLong(0) == (0L until 10L).map(_ * 10).sum)
    // and the drop is still visible in history
    assert(!t.read(spark, Some(2)).columns.contains("v"))
  }

  test("restore is FULL-state: pre-rename restore brings the old name back") {
    val t = freshTable()
    t.append(spark, keyed(0, 5, 1))  // v1
    t.renameColumn("v", "amount")    // v2
    t.restore(1)                     // v3
    assert(t.read(spark).columns.contains("v"))
    assert(t.snapshot().colMap.isEmpty)
  }

  test("restore is FULL-state: a later-declared constraint is released by the rewind") {
    import spark.implicits._
    val t = freshTable()
    t.append(spark, keyed(0, 5, 1))        // v1
    t.addConstraint(spark, "v >= 0")       // v2
    t.restore(1)                           // v3
    assert(t.snapshot().constraints.isEmpty)
    t.append(spark, Seq((9L, -1L)).toDF("k", "v")) // would violate the old CHECK
    assert(t.read(spark).count() == 6)
  }

  test("restore carries stream txn watermarks FORWARD (idempotence is not undone)") {
    val t = freshTable()
    t.append(spark, keyed(0, 10, 1)) // v1
    // a stream sink records its watermark in a later version
    t.appendBatch(spark, keyed(10, 20, 1), "appA", 7) // v2
    t.restore(1)
    // the restored DATA is v1's…
    assert(ks(t) == (0L until 10L))
    // …but the appA watermark survives: a replayed batch 7 must be refused
    val before = t.currentVersion
    t.appendBatch(spark, keyed(10, 20, 1), "appA", 7)
    assert(t.currentVersion == before,
      "replayed stream batch was re-applied after restore — idempotence lost")
  }

  test("restore undoes ADD COLUMN even when the target predates declared metadata") {
    val t = freshTable()
    t.append(spark, keyed(0, 5, 1))                  // v1: born via append, no meta
    t.addColumn(spark, "note",
      org.apache.spark.sql.types.StringType)         // v2: first meta record
    assert(t.read(spark).columns.contains("note"))
    t.restore(1)                                     // v3
    assert(!t.read(spark).columns.contains("note"),
      "the phantom NULL column must not survive a restore to a pre-meta version")
    // and the restore is itself undoable: forward again re-reveals the column
    t.restore(2)
    assert(t.read(spark).columns.contains("note"))
  }
}
