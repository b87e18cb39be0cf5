package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Incremental CDC-apply replication
  * ([[graft.tables.TxTable#applyChangesFrom]]): the replica pulls the
  * source's row-level change feed since its last applied version and
  * folds it in exactly once — the applied-through version rides the
  * replica's own txn watermark, so replayed/idle syncs no-op and a
  * reader of the replica only ever sees consistent source cuts. Spec
  * pins convergence across an eventful history (merge, band delete,
  * positional delete, compaction), staged incremental syncs, replay
  * idempotence, cross-version churn cancellation, and copy-on-write
  * candidate accounting on the replica side. */
class ReplicationSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): TxTable = {
    val root = Files.createTempDirectory("graft_replica").toString
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
    df.select(col("k"), col("v")).as[(Long, Long)].collect().sorted.toSeq
  }

  test("staged syncs converge to every source cut; final replica == live source") {
    import spark.implicits._
    val src = fresh(); val dst = fresh()
    src.append(spark, keyed(0, 100, 2))   // v1
    src.append(spark, keyed(100, 200, 2)) // v2
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 2)
    assert(rows(dst.read(spark)) == rows(src.read(spark)),
      "after the first sync the replica is the v2 cut")
    src.merge(spark, spark.range(10, 20).toDF("k").withColumn("v", lit(-1L)), "k") // v3
    src.delete(spark, "k", 150, 169)       // v4
    src.deletePositional(spark, "k", 5, 5) // v5
    src.compact(spark, smallRows = Long.MaxValue / 2) // v6
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 6)
    assert(rows(dst.read(spark)) == rows(src.read(spark)),
      "the second sync must fold merge + deletes + compaction exactly")
  }

  test("replayed and idle syncs are recognized no-ops — exactly once") {
    val src = fresh(); val dst = fresh()
    src.append(spark, keyed(0, 50, 1))
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 1)
    val vAfter = dst.currentVersion
    // idle: no new source versions — no commit, same watermark
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 1)
    assert(dst.currentVersion == vAfter, "an idle sync must not mint a version")
    // a second app id replicates independently
    assert(dst.applyChangesFrom(spark, src, "other", "k") == 1)
    assert(dst.currentVersion == vAfter + 1)
    assert(rows(dst.read(spark)) != Nil)
  }

  test("cross-version churn cancels: insert-then-delete within one sync moves nothing") {
    val src = fresh(); val dst = fresh()
    src.append(spark, keyed(0, 50, 1))  // v1
    src.append(spark, keyed(90, 95, 1)) // v2: 5 transient rows
    src.delete(spark, "k", 90, 94)      // v3: gone again
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 3)
    assert(rows(dst.read(spark)) == (0L until 50L).map(k => (k, k * 10)),
      "transient rows must cancel, not land then vanish")
    // and the replica never wrote the transient rows at all: one sync,
    // one commit, inserts only
    assert(dst.currentVersion == 1)
  }

  test("an insert-only sync rewrites no replica files (copy-on-write accounting)") {
    val src = fresh(); val dst = fresh()
    src.append(spark, keyed(0, 100, 2))
    dst.applyChangesFrom(spark, src, "rep", "k")
    val before = dst.snapshot().files.map(_.path).toSet
    src.append(spark, keyed(500, 510, 1)) // disjoint append
    dst.applyChangesFrom(spark, src, "rep", "k")
    assert(before.subsetOf(dst.snapshot().files.map(_.path).toSet),
      "existing replica files must carry by name through an insert-only sync")
    assert(rows(dst.read(spark)) == rows(src.read(spark)))
  }

  test("a delete-only sync converges in exactly one replica commit") {
    val src = fresh(); val dst = fresh()
    src.append(spark, keyed(0, 1000, 10))
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 1)
    src.delete(spark, "k", 150, 169) // v2: 20 victims
    assert(dst.applyChangesFrom(spark, src, "rep", "k") == 2)
    assert(dst.currentVersion == 2, "one sync, one commit")
    assert(rows(dst.read(spark)) == rows(src.read(spark)))
    assert(dst.read(spark).count() == 980)
  }
}
