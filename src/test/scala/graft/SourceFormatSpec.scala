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
    // ORC is the second binary columnar format Spark bundles: unlike
    // JSON/CSV it carries its own schema and types, so the round-trip
    // needs no schema hint — a true second source implementation
    flat.write.mode("overwrite").orc(s"$tmp/orc")
    assert(agg(spark.read.orc(s"$tmp/orc")) == base)
  }

  test("schema evolution: mergeSchema unions file schemas, null-fills, keeps pushdown") {
    import spark.implicits._
    // a table written over months gains a column mid-history — readers
    // must see one unioned schema with NULLs where old files predate it,
    // and predicate pushdown must survive the merged footer read
    val dir = java.nio.file.Files.createTempDirectory("graft_evo_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(dir)
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = df.select(col("id"), col("v1"), col("v2"))
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
    // filtering on the NEW column prunes old files entirely (v2 IS NULL
    // there) and the predicate still reaches the scan
    val newOnly = df.filter(col("v2") === 30L)
    assert(newOnly.count() == 1)
    val plan = newOnly.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v2), EqualTo(v2,30)"),
      s"pushdown lost under mergeSchema:\n$plan")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // THE 100 TB join strategy for repeated joins on a stable key: both
    // sides pre-hashed into the same bucket count on the join key at
    // write time means every join on that key is Exchange-free forever —
    // the shuffle is paid once at ingest, not per query. (File-source
    // bucketing needs the catalog, hence saveAsTable; broadcast is
    // disabled so the test proves bucketing, not small-table luck.)
    Tables.ensure(spark)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
      j.collect()
      // AQE's toString echoes the Initial Plan below the Final Plan —
      // count exchanges in the final section only
      val plan = j.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      // the only hash exchange allowed is the post-join aggregation one —
      // the join itself must read both sides bucket-aligned
      assert(exchanges <= 1, s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      // and the result equals the plain (unbucketed) join
      val plain = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_nationkey")).collect().toSeq
      assert(j.orderBy(col("c_nationkey")).collect().toSeq == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
