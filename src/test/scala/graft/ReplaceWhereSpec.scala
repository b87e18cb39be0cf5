package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Atomic band overwrite ([[graft.tables.TxTable#overwriteWhere]] —
  * Delta's `replaceWhere`, the backfill/restatement path): one commit
  * swaps the [lo, hi] band for the supplied replacement, classifying
  * victims from manifest stats exactly like delete (covered files drop
  * metadata-only, straddlers rewrite, disjoint files carry by name),
  * and REFUSES a replacement that leaks rows outside its declared band
  * before anything becomes visible. */
class ReplaceWhereSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): TxTable = {
    val root = Files.createTempDirectory("graft_replace").toString
    new TxTable(root, Seq("k"))
  }

  /** rows keyed [lo, hi), v = k * 10, range-partitioned into `parts`
    * files (TxTableSpec's fixture shape). */
  private def keyed(lo: Long, hi: Long, parts: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(parts, col("k"))
  }

  test("band swap is one commit: covered dropped, straddlers rewritten, rest by name") {
    val t = fresh()
    t.append(spark, keyed(0, 1000, 10)) // files of 100 keys: [0,100), [100,200), ...
    val before = t.snapshot().files.map(_.path).toSet
    import spark.implicits._
    // restate [150, 449] with half the rows at a new value law: covers
    // [200,300) and [300,400) whole, straddles [100,200) and [400,500)
    val restated = spark.range(150, 450, 2).toDF("k")
      .withColumn("v", col("k") * -1)
      .repartitionByRange(3, col("k"))
    val r = t.overwriteWhere(spark, "k", 150, 449, restated)
    assert(r.version == 2)
    assert(r.droppedFiles == 2, s"expected 2 metadata-only drops, got $r")
    assert(r.rewrittenFiles == 2, s"expected 2 straddler rewrites, got $r")
    assert(r.keptFiles == 6, s"expected 6 untouched files, got $r")
    assert(r.newFiles >= 4, s"replacement + rewrite files missing, got $r")
    // ONE commit: no intermediate deleted-but-not-replaced version exists
    assert(t.currentVersion == 2)
    // disjoint files carried by name, never copied
    assert(t.snapshot().files.map(_.path).toSet.intersect(before).size == 6)
    val got = t.read(spark).select(col("k"), col("v"))
      .as[(Long, Long)](spark.implicits.newProductEncoder).collect().toMap
    val expected =
      ((0L until 150L) ++ (450L until 1000L)).map(k => k -> k * 10).toMap ++
        (150L until 450L by 2).map(k => k -> -k).toMap
    assert(got == expected,
      "old band fully gone, new band fully in, outside rows untouched")
    // time travel still reads the pre-restatement content
    assert(t.read(spark, versionAsOf = Some(1)).count() == 1000)
  }

  test("a replacement leaking outside its declared band is refused whole") {
    val t = fresh()
    t.append(spark, keyed(0, 1000, 10))
    import spark.implicits._
    val leaky = spark.range(150, 460).toDF("k") // 450..459 escape [150, 449]
      .withColumn("v", lit(-1L)).repartitionByRange(3, col("k"))
    val ex = intercept[IllegalArgumentException] {
      t.overwriteWhere(spark, "k", 150, 449, leaky)
    }
    assert(ex.getMessage.contains("escape"))
    // nothing became visible: same version, content untouched
    assert(t.currentVersion == 1)
    assert(t.read(spark).count() == 1000)
  }

  test("an empty replacement degenerates to delete-the-band") {
    val t = fresh()
    t.append(spark, keyed(0, 1000, 10))
    import spark.implicits._
    val empty = spark.range(0, 0).toDF("k").withColumn("v", lit(0L))
    val r = t.overwriteWhere(spark, "k", 200, 399, empty)
    assert(r.droppedFiles == 2 && r.newFiles == 0)
    val got = t.read(spark).select(col("k"))
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq
    assert(got == ((0L until 200L) ++ (400L until 1000L)))
  }

  test("overwriteWhere rebases across a disjoint concurrent append") {
    val t = fresh()
    t.append(spark, keyed(0, 1000, 10))
    import spark.implicits._
    val base = t.snapshot()
    t.append(spark, keyed(5000, 5010, 1)) // outside the band
    val restated = spark.range(200, 400).toDF("k")
      .withColumn("v", lit(-1L)).repartitionByRange(2, col("k"))
    val r = t.overwriteWhereFrom(spark, base, "k", 200, 399, restated)
    assert(r.version == 3)
    assert(t.read(spark).count() == 1000 + 10)
    // and an overlapping concurrent append still aborts
    val base2 = t.snapshot()
    t.append(spark, keyed(250, 260, 1))
    intercept[java.util.ConcurrentModificationException] {
      t.overwriteWhereFrom(spark, base2, "k", 200, 399, restated)
    }
  }
}
