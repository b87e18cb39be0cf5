package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the one-pass winnowing expression: bit-equality with the
  * exploded window formulation (the oracle-checked reference twin) on the
  * real corpus, edge lengths, surrogate (non-BMP) grams, and the
  * winnowing guarantee itself through the expression path. */
class WinnowFpsSpec extends AnyFunSuite with SparkFixture {

  private def exprFps(docs: org.apache.spark.sql.DataFrame) = {
    Tables.ensure(spark)
    docs.filter(length(col("text")) >= 12)
      .select(col("doc_id"), explode(expr("winnow_fps(text, 5, 8)")).as("sel"))
  }

  test("expression equals the exploded formulation on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val a = exprFps(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = queries.Analytics2.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"expression/exploded diverge: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
    assert(a.nonEmpty)
  }

  test("documents shorter than k+w-1 yield no fingerprints") {
    import spark.implicits._
    Tables.ensure(spark)
    val got = Seq((1L, "abcdefghijk"), (2L, "abcdefghijkl"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), size(expr("winnow_fps(text, 5, 8)")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got(1L) == 0, "11 code points = 7 grams < w, no full window")
    assert(got(2L) == 1, "12 code points = exactly one full window")
  }

  test("non-BMP text windows by code point, matching the exploded form") {
    import spark.implicits._
    Tables.ensure(spark)
    val docs = Seq((7L, "a😀bcd😁efghij klmnop")).toDF("doc_id", "text")
    val a = exprFps(docs).collect().map(_.getLong(1)).toSet
    val b = queries.Analytics2.winnowFingerprints(docs).collect().map(_.getLong(1)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("winnowing guarantee: a shared >=12-char run shares a fingerprint hash") {
    import spark.implicits._
    Tables.ensure(spark)
    val shared = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"XXXXX $shared YYYYY"),
      (2L, s"zq vw $shared 01 23 45")).toDF("doc_id", "text")
    val hashes = exprFps(docs)
      .select(col("doc_id"), expr("sel div 1048576").as("h"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert((hashes(1L) intersect hashes(2L)).nonEmpty,
      "docs sharing a 25-char run must share a selected hash")
  }
}
