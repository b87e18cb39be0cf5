package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format independence: the engine's results must not depend on
  * the storage format feeding it. The normalized events frame is round-
  * tripped through JSON and headered CSV (schema supplied explicitly —
  * both formats are schema-less on disk) and an aggregation over each
  * must equal the parquet-sourced answer. Timestamps travel as epoch-µs
  * longs (JSON/CSV have no native timestamp-ns), doubles round-trip
  * exactly via shortest-repr printing, and the quoted JSON props column
  * exercises CSV escaping. */
class SourceFormatSpec extends AnyFunSuite with SparkFixture {

  test("parquet == json == csv for the same rows") {
    Tables.ensure(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt_").toString
    val flat = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
    flat.write.mode("overwrite").json(s"$tmp/json")
    flat.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    def agg(df: DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("ts_us")).as("s"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"),
        count(col("props")).as("np"))
      .orderBy(col("event_type")).collect().toSeq.map(_.toSeq)
    val base = agg(flat)
    assert(base.nonEmpty)
    val schema = flat.schema
    assert(agg(spark.read.schema(schema).json(s"$tmp/json")) == base)
    assert(agg(spark.read.schema(schema).option("header", "true").csv(s"$tmp/csv")) == base)
  }
}
