package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** ALTER COLUMN TYPE widening contract ([[TxTable.alterColumnType]],
  * Delta type-widening semantics): metadata-only (zero files written),
  * old narrow files read WIDE, mixed-era file sets (narrow + wide) read
  * under the declaration, post-widening appends carry values outside
  * the narrow range, time travel shows the narrow type at pre-widening
  * versions, CDF across the widening reports no phantom changes, and
  * lossy conversions refuse loudly. */
class TxTypeWideningSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_txwiden").toString

  private def dataFileNames(root: String): Set[String] =
    Option(Paths.get(root, "data").toFile.listFiles())
      .getOrElse(Array.empty).map(_.getName).filterNot(_.startsWith(".")).toSet

  private def intTable(): TxTable = {
    val t = new TxTable(tmpRoot(), Seq("k"))
    t.append(spark, spark.range(0, 20).toDF("k")
      .withColumn("v", (col("k") * 10).cast("int"))
      .withColumn("f", (col("k") / 4.0).cast("float"))
      .repartitionByRange(2, col("k")))
    t
  }

  test("widening is metadata-only; narrow files read wide; appends go beyond the narrow range") {
    val t = intTable()
    val before = dataFileNames(t.root)
    t.alterColumnType(spark, "v", LongType)   // v2
    t.alterColumnType(spark, "f", DoubleType) // v3
    assert(dataFileNames(t.root) == before, "widening must write no data files")
    val widened = t.read(spark)
    assert(widened.schema("v").dataType == LongType)
    assert(widened.schema("f").dataType == DoubleType)
    assert(widened.agg(sum(col("v"))).head().getLong(0) ==
      (0L until 20L).map(_ * 10).sum)
    // a post-widening append carries a value an INT cannot hold — the
    // mixed-era read (int32 files + int64 files) comes back correct
    t.append(spark, Seq((100L, 5000000000L, 2.5d)).toDF("k", "v", "f"))
    val mixed = t.read(spark)
    assert(mixed.schema("v").dataType == LongType)
    assert(mixed.count() == 21)
    assert(mixed.filter(col("k") === 100).head().getLong(1) == 5000000000L)
    assert(mixed.agg(sum(col("v"))).head().getLong(0) ==
      (0L until 20L).map(_ * 10).sum + 5000000000L)
    // model differential: the whole content equals the plain-Scala fold
    val got = mixed.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 20L).map(k => (k, k * 10)).toSet + ((100L, 5000000000L))
    assert(got == want)
  }

  test("time travel reads the narrow type at pre-widening versions") {
    val t = intTable()
    t.alterColumnType(spark, "v", LongType) // v2
    assert(t.read(spark, versionAsOf = Some(1)).schema("v").dataType == IntegerType,
      "version 1 predates the declaration and must read narrow")
    assert(t.read(spark, versionAsOf = Some(2)).schema("v").dataType == LongType)
  }

  test("CDF across a widening reports no phantom row changes") {
    val t = intTable()                                   // v1
    t.alterColumnType(spark, "v", LongType)              // v2: meta-only
    t.append(spark, Seq((200L, 7L, 0.5d)).toDF("k", "v", "f")) // v3
    val changes = t.rowChangesBetween(spark, 2, 3)
    // the widening itself contributes NOTHING; only the append shows
    assert(changes.filter(col("_change_type") === "insert").count() == 1)
    assert(changes.filter(col("_change_type") =!= "insert").count() == 0)
  }

  test("lossy or nonsensical conversions refuse loudly; restore undoes a widening") {
    val t = intTable()
    intercept[IllegalArgumentException] {
      t.alterColumnType(spark, "v", IntegerType) // already int — no-op is an error
    }
    intercept[IllegalArgumentException] {
      t.alterColumnType(spark, "f", LongType) // float → long is lossy
    }
    intercept[IllegalArgumentException] {
      t.alterColumnType(spark, "v", StringType) // representation change
    }
    intercept[IllegalArgumentException] {
      t.alterColumnType(spark, "nope", LongType)
    }
    t.alterColumnType(spark, "v", LongType) // v2
    t.restore(1)                            // v3: the widening is undone
    assert(t.read(spark).schema("v").dataType == IntegerType)
  }

  test("the native ALTER TABLE … ALTER COLUMN … TYPE statement routes through the catalog") {
    Tables.ensure(spark)
    val t = intTable()
    spark.sql(s"ALTER TABLE txtable.`${t.root}` ALTER COLUMN v TYPE BIGINT")
    val got = spark.sql(s"SELECT sum(v) AS s FROM txtable.`${t.root}`").head()
    assert(got.getLong(0) == (0L until 20L).map(_ * 10).sum)
    assert(spark.table(s"txtable.`${t.root}`").schema("v").dataType == LongType)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE txtable.`${t.root}` ALTER COLUMN f TYPE INT")
    }
  }
}
