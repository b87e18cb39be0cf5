package graft

import graft.functions.{MinHashSig, SimHashSig, XxHash64Chain}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the JVM-side xxhash64 replica (XxHash64Chain) byte-equal to the
  * Spark SQL `xxhash64` expression — the property that lets the typed
  * Aggregators (MinHashSig / SimHashSig) replace expression pipelines in
  * q_dedup_minhash / q_dedup_simhash without changing any output row. */
class HashCompatSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private lazy val words = Tables.documents(spark, sf)
    .select(explode(array_distinct(split(col("text"), " "))).as("word"))
    .distinct()

  test("hashString == xxhash64(word) for every corpus token") {
    val rows = words.select(col("word"), xxhash64(col("word")).as("h"))
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, h) =>
      assert(XxHash64Chain.hashString(w) == h, s"hashString mismatch for '$w'")
    }
  }

  test("hashStringInt == xxhash64(word, lit(s)) for all 32 minhash seeds") {
    val cols = (0 until 32).map(s => xxhash64(col("word"), lit(s)).as(s"h$s"))
    val rows = words.select(col("word") +: cols: _*).collect()
    rows.foreach { r =>
      val w = r.getString(0)
      (0 until 32).foreach { s =>
        assert(XxHash64Chain.hashStringInt(w, s) == r.getLong(s + 1),
          s"hashStringInt mismatch for '$w' seed $s")
      }
    }
  }

  test("MinHashSig aggregator == 32-MIN xxhash64 expression signatures") {
    val tokens = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
    val viaAgg = tokens.groupBy(col("doc_id"))
      .agg(MinHashSig.minhash32(col("word")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val minCols = (0 until 32).map(s => min(xxhash64(col("word"), lit(s))).as(s"m$s"))
    val viaExpr = tokens.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 32).map(s => col(s"m$s")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaAgg.nonEmpty && viaAgg == viaExpr)
  }

  test("SimHashSig aggregator == 64x-explode vote formulation signatures") {
    val tokens = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
    val viaAgg = tokens.groupBy(col("doc_id"))
      .agg(SimHashSig.simhash64(col("word")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val viaExpr = tokens
      .withColumn("h", xxhash64(col("word")))
      .withColumn("j", explode(typedLit((0 until 64).toArray)))
      .withColumn("vote", when(expr("(h >> j) & 1") === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("vote")).as("s"))
      .withColumn("bit", when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bit")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg.nonEmpty && viaAgg == viaExpr)
  }
}
