package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Named-ref (tag) contract on the transactional table: immutable
  * put-if-absent creation, read-by-name, and — the load-bearing part —
  * vacuum retention: a tagged version survives any vacuum EXACTLY
  * (content equality, not just "doesn't crash") while untagged
  * neighbors of the same age are reclaimed; deleting the tag releases
  * the version to the next vacuum. */
class TxTagSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): TxTable =
    new TxTable(Files.createTempDirectory("graft_txtag").toString, Seq("k"))

  private def keyed(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k").withColumn("v", col("k") * 10)
      .repartition(1)
  }

  private def content(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("k"), col("v"))
      .as[(Long, Long)](spark.implicits.newProductEncoder).collect().toSeq.sorted

  test("tag + readTag pins a version by name; tags list; invalid targets refuse") {
    val t = freshTable()
    t.append(spark, keyed(0, 10))   // v1
    t.append(spark, keyed(10, 20))  // v2
    t.tag("release-1", 1)
    assert(t.tags == Map("release-1" -> 1))
    assert(content(t.readTag(spark, "release-1")) ==
      content(t.read(spark, Some(1))))
    intercept[IllegalArgumentException](t.tag("nope", 99))
    intercept[IllegalArgumentException](t.tag("bad name!", 1))
    intercept[IllegalArgumentException](t.readTag(spark, "ghost"))
  }

  test("tags are immutable: re-tagging a name refuses until deleteTag") {
    val t = freshTable()
    t.append(spark, keyed(0, 10)) // v1
    t.append(spark, keyed(10, 20)) // v2
    t.tag("r", 1)
    intercept[IllegalStateException](t.tag("r", 2))
    assert(t.deleteTag("r"))
    assert(!t.deleteTag("r"))
    t.tag("r", 2)
    assert(t.tags("r") == 2)
  }

  test("vacuum retains a tagged version exactly while reclaiming untagged peers") {
    val t = freshTable()
    t.append(spark, keyed(0, 10))    // v1 (will expire)
    t.append(spark, keyed(10, 20))   // v2 (tagged — must survive)
    t.append(spark, keyed(20, 30))   // v3 (will expire)
    t.append(spark, keyed(30, 40))   // v4
    t.append(spark, keyed(40, 50))   // v5 (current)
    t.tag("audit", 2)
    val want = content(t.read(spark, Some(2)))
    val (files, dropped) = t.vacuum(retainVersions = 2) // keep v4, v5 (+tag)
    assert(dropped == 2, s"expected v1 and v3 dropped, got $dropped")
    assert(files == 0,
      "append-only history shares every file forward; nothing is reclaimable " +
        s"while v2 pins the tail (got $files)")
    // the tagged version still reads EXACTLY
    assert(content(t.readTag(spark, "audit")) == want)
    // untagged expired neighbors refuse
    intercept[IllegalArgumentException](t.read(spark, Some(1)))
    intercept[IllegalArgumentException](t.read(spark, Some(3)))
  }

  test("deleting the tag releases its version (and files) to the next vacuum") {
    val t = freshTable()
    t.append(spark, keyed(0, 10))    // v1
    t.delete(spark, "k", 0, 100)     // v2: rewrite drops v1's file from HEAD
    t.append(spark, keyed(50, 60))   // v3
    t.append(spark, keyed(60, 70))   // v4
    t.tag("keep-v1", 1)
    t.vacuum(retainVersions = 2)
    assert(content(t.readTag(spark, "keep-v1")) ==
      (0L until 10L).map(k => (k, k * 10)))
    assert(t.deleteTag("keep-v1"))
    val (files2, dropped2) = t.vacuum(retainVersions = 2)
    assert(dropped2 >= 1, "the released version must now expire")
    assert(files2 >= 1, "v1's file is referenced by no retained version and must go")
    intercept[IllegalArgumentException](t.read(spark, Some(1)))
  }

  test("two tags below the cutoff each reconstruct from their own checkpoints") {
    val t = freshTable()
    (0 until 6).foreach(i => t.append(spark, keyed(i * 10L, i * 10L + 10L))) // v1..v6
    t.tag("t2", 2)
    t.tag("t4", 4)
    val w2 = content(t.read(spark, Some(2)))
    val w4 = content(t.read(spark, Some(4)))
    t.vacuum(retainVersions = 1) // only v6 (+tags) retained; v1,v3,v5 drop
    assert(content(t.readTag(spark, "t2")) == w2)
    assert(content(t.readTag(spark, "t4")) == w4)
    intercept[IllegalArgumentException](t.read(spark, Some(3)))
  }
}
