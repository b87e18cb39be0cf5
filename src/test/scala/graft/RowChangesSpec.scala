package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Row-level change data feed
  * ([[graft.tables.TxTable#rowChangesBetween]] — the Delta CDF
  * `_change_type` face): every version's row changes as insert/delete
  * pairs diffed from the manifest's (path, dv) delta, multiset
  * semantics so carried rows cancel. The headline property is
  * REPLICATION TOTALITY: replaying each version's deletes-then-inserts
  * into an empty replica converges to the source exactly — merges,
  * deletes, positional deletes and compactions included — which the
  * file-level changesBetween (appends-only + skip) cannot offer. */
class RowChangesSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): TxTable = {
    val root = Files.createTempDirectory("graft_cdf").toString
    new TxTable(root, Seq("k"))
  }

  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(parts, col("k"))
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] = {
    import spark.implicits._
    df.select(col("k"), col("v"))
      .as[(Long, Long)].collect().sorted.toSeq
  }

  /** The eventful history every test shares: two appends, an update
    * merge, a band delete, a positional delete, a compaction. */
  private def eventfulTable(): TxTable = {
    import spark.implicits._
    val t = fresh()
    t.append(spark, keyed(0, 100, 2))   // v1
    t.append(spark, keyed(100, 200, 2)) // v2
    t.merge(spark, spark.range(10, 20).toDF("k").withColumn("v", lit(-1L)), "k") // v3
    t.delete(spark, "k", 150, 169)      // v4
    t.deletePositional(spark, "k", 5, 5) // v5
    t.compact(spark, smallRows = Long.MaxValue / 2) // v6
    t
  }

  test("replication totality: replaying deletes-then-inserts converges to the source") {
    val t = eventfulTable()
    var replica: Seq[(Long, Long)] = Nil
    for (v <- 1 to t.currentVersion) {
      val ch = t.rowChangesBetween(spark, v - 1, v)
      val dels = rows(ch.filter(col("_change_type") === "delete"))
      val ins = rows(ch.filter(col("_change_type") === "insert"))
      // multiset apply: remove each deleted row once, then add inserts
      val afterDel = dels.foldLeft(replica) { (acc, d) =>
        val i = acc.indexOf(d); assert(i >= 0, s"v$v deletes absent row $d"); acc.patch(i, Nil, 1)
      }
      replica = (afterDel ++ ins).sorted
    }
    assert(replica == rows(t.read(spark)),
      "replaying the full CDF must reproduce the live table exactly")
  }

  test("an update merge emits ONLY its changed rows, not the files it rewrote") {
    val t = eventfulTable()
    val ch = t.rowChangesBetween(spark, 2, 3)
    assert(rows(ch.filter(col("_change_type") === "delete")) ==
      (10L until 20L).map(k => (k, k * 10)).sorted,
      "deletes = the 10 old images, though the rewrite touched a 50-row file")
    assert(rows(ch.filter(col("_change_type") === "insert")) ==
      (10L until 20L).map(k => (k, -1L)).sorted,
      "inserts = the 10 new images")
  }

  test("a band delete emits its victims as deletes; a positional delete its vectored rows") {
    val t = eventfulTable()
    val band = t.rowChangesBetween(spark, 3, 4)
    assert(band.filter(col("_change_type") === "insert").count() == 0)
    assert(rows(band) == (150L until 170L).map(k => (k, k * 10)).sorted)
    val dv = t.rowChangesBetween(spark, 4, 5)
    assert(rows(dv) == Seq((5L, 50L)))
    assert(dv.select(col("_change_type")).distinct().collect().map(_.getString(0)).toSeq
      == Seq("delete"))
  }

  test("compaction emits ZERO change rows — no skip hack needed") {
    val t = eventfulTable()
    assert(t.rowChangesBetween(spark, 5, 6).count() == 0,
      "a content-preserving rewrite must cancel out entirely")
  }

  test("appends emit pure inserts, tagged with their commit version") {
    val t = eventfulTable()
    val ch = t.rowChangesBetween(spark, 0, 2)
    assert(ch.filter(col("_change_type") === "delete").count() == 0)
    assert(rows(ch.filter(col("_commit_version") === 1)) ==
      (0L until 100L).map(k => (k, k * 10)).sorted)
    assert(rows(ch.filter(col("_commit_version") === 2)) ==
      (100L until 200L).map(k => (k, k * 10)).sorted)
  }

  test("schema evolution: pre-evolution rows diff with NULL in the new column") {
    import spark.implicits._
    val t = fresh()
    t.append(spark, keyed(0, 10, 1)) // v1: (k, v)
    t.append(spark, spark.range(10, 20).toDF("k")
      .withColumn("v", col("k") * 10).withColumn("w", lit(7L))) // v2: (k, v, w)
    t.delete(spark, "k", 0, 4) // v3: rewrites a pre-evolution file
    val ch = t.rowChangesBetween(spark, 2, 3)
    val dels = ch.filter(col("_change_type") === "delete")
      .select(col("k"), col("w")).collect()
    assert(dels.length == 5 && dels.forall(_.isNullAt(1)),
      "old-schema victims must surface with NULL in the evolved column")
  }
}
