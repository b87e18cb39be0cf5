package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Bloom-filter file skipping ([[graft.tables.TxTable#readEquals]]):
  * the point-lookup pruning tier min/max stats cannot serve. The
  * fixture hash-scatters keys so every file's [min,max] spans the whole
  * domain — range stats would scan everything — then asserts the bloom
  * prunes to a handful of files, that NO key ever loses rows (blooms
  * admit false positives, never false negatives), that blooms survive a
  * manifest round-trip and compaction, and that files written before
  * the bloom declaration stay scanned (the soundness rule for mixed
  * histories). */
class BloomSkipSpec extends AnyFunSuite with SparkFixture {

  /** keys 0..63, 8 rows each, HASH-partitioned into 8 files: each file
    * holds ~8 distinct keys but its [min,max] straddles nearly the full
    * 0..63 domain, so range pruning is useless by construction. */
  private def hashed() = {
    import spark.implicits._
    spark.range(0, 512).toDF("id")
      .select((col("id") % 64).as("k"), (col("id") * 10).as("v"))
      .repartition(8, col("k"))
  }

  private def fresh(): TxTable = {
    val root = Files.createTempDirectory("graft_bloom").toString
    new TxTable(root, Seq("k"), Seq("k"))
  }

  test("equality probe prunes files range stats cannot, and stays exact") {
    val t = fresh()
    t.append(spark, hashed())
    val pr = t.readEquals(spark, "k", 17L)
    assert(pr.filesTotal == 8)
    // all of key 17's rows hash to one file; blooms may admit a false
    // positive or two, but must not degenerate to a full scan
    assert(pr.filesScanned <= 3, s"scanned ${pr.filesScanned} of 8")
    val got = pr.df.select(col("k"), col("v"))
      .as[(Long, Long)](spark.implicits.newProductEncoder).collect().sorted
    assert(got.toSeq == (0L until 512L).filter(_ % 64 == 17)
      .map(id => (17L, id * 10)))
    // and range stats alone really are useless on this layout:
    val byRange = t.readWhere(spark, "k", 17, 17)
    assert(byRange.filesScanned == 8, "fixture must defeat min/max pruning")
  }

  test("no false negatives: every key returns exactly its rows") {
    val t = fresh()
    t.append(spark, hashed())
    (0L until 64L).foreach { k =>
      assert(t.readEquals(spark, "k", k).df.count() == 8, s"key $k lost rows")
    }
  }

  test("blooms survive the manifest round-trip (fresh reader instance)") {
    val t = fresh()
    t.append(spark, hashed())
    val reopened = new TxTable(t.root, Seq("k"), Seq("k"))
    val pr = reopened.readEquals(spark, "k", 42L)
    assert(pr.filesScanned <= 3 && pr.filesTotal == 8)
    assert(pr.df.count() == 8)
  }

  test("compaction rewrites carry fresh blooms; probe stays pruned and exact") {
    val t = fresh()
    t.append(spark, hashed())
    t.compact(spark, smallRows = 100) // every 64-row file is "small"
    val pr = t.readEquals(spark, "k", 5L)
    assert(pr.filesTotal < 8, "compaction must have coalesced files")
    assert(pr.df.count() == 8)
    assert(t.snapshot().files.forall(_.blooms.contains("k")),
      "rewritten files must carry recomputed blooms")
  }

  test("q_table_bloomskip's gate query really skips files on the hash layout") {
    // sf0.001 has only ~15 distinct user_ids, so several of the 16 hash
    // partitions are empty and write no file — assert shape + pruning
    // ratio, not the partition count.
    val pr = graft.queries.TableOps.bloomPruned(spark, "/root/testdata/sf0.001")
    assert(pr.filesTotal >= 8, s"expected a many-file hash table, got ${pr.filesTotal}")
    assert(pr.filesScanned <= 3,
      s"a point probe should hit ~1 of ${pr.filesTotal} hash files, not ${pr.filesScanned}")
  }

  test("files written before the bloom (and stats) declaration are scanned, not lost") {
    val root = Files.createTempDirectory("graft_bloom").toString
    new TxTable(root, Nil, Nil).append(spark, hashed()) // blind history
    val declared = new TxTable(root, Seq("k"), Seq("k"))
    declared.append(spark, hashed()) // new files carry stats + blooms
    val pr = declared.readEquals(spark, "k", 9L)
    assert(pr.filesTotal == 16)
    // the 8 blind files are unprunable (nothing proves them key-free),
    // the 8 bloomed ones prune to ~1 — both halves' rows must arrive
    assert(pr.filesScanned >= 9 && pr.filesScanned <= 11,
      s"scanned ${pr.filesScanned}")
    assert(pr.df.count() == 16)
  }
}
