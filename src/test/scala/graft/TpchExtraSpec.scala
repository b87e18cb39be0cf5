package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TpchExtra

/** Semantic edge pins for the round-8 TPC-H shapes on CONSTRUCTED
  * micro-tables — the DuckDB oracle checks the fixed corpus; these pin
  * the decision boundaries it cannot steer onto: Q21's
  * single-late-supplier correlation, Q13's zero-order bucket, Q22's
  * strict above-average boundary, Q20's strict dominance threshold.
  * Each test writes a tiny table set to a temp dir shaped exactly like
  * the driver's sf dirs and runs the REAL query function against it. */
class TpchExtraSpec extends AnyFunSuite with SparkFixture {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private def mkDir(): String =
    Files.createTempDirectory("graft_tpch_edge").toString

  private def write(dir: String, name: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def ordersDf(rows: Seq[(Long, Long, String, Double, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
    spark.createDataFrame(rows.map(r =>
      Row(r._1, r._2, r._3, r._4, ts(r._5), r._6)).asJava, schema)
  }

  private def lineitemDf(rows: Seq[(Long, Long, Long, Int, Double, String)]): DataFrame = {
    // (orderkey, partkey, suppkey, linenumber, quantity, shipdate)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    spark.createDataFrame(rows.map(r =>
      Row(r._1, r._2, r._3, r._4, r._5, 1000.0, 0.0, 0.0, "N", "O", ts(r._6))).asJava,
      schema)
  }

  private def supplierDf(keys: Seq[Long]): DataFrame = {
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
    spark.createDataFrame(keys.map(k =>
      Row(k, f"Supplier#$k%03d", 1, 100.0)).asJava, schema)
  }

  test("q_tpch_q21: only the sole-late supplier of a multi-supplier F order waits") {
    val dir = mkDir()
    // order 1: supplier 10 late, supplier 20 on time     -> 10 waits
    // order 2: suppliers 10 and 20 BOTH late             -> nobody (NOT EXISTS fails)
    // order 3: single-supplier order, supplier 30 late   -> nobody (EXISTS fails)
    // order 4: late supplier 40 but order status 'O'     -> nobody (status filter)
    write(dir, "orders", ordersDf(Seq(
      (1L, 1L, "F", 0.0, "1995-01-01", "3-MEDIUM"),
      (2L, 1L, "F", 0.0, "1995-01-01", "3-MEDIUM"),
      (3L, 1L, "F", 0.0, "1995-01-01", "3-MEDIUM"),
      (4L, 1L, "O", 0.0, "1995-01-01", "3-MEDIUM"))))
    write(dir, "lineitem", lineitemDf(Seq(
      (1L, 1L, 10L, 1, 1.0, "1995-06-01"), // late (>90d)
      (1L, 1L, 20L, 2, 1.0, "1995-01-15"), // on time
      (2L, 1L, 10L, 1, 1.0, "1995-06-01"), // late
      (2L, 1L, 20L, 2, 1.0, "1995-06-01"), // late too
      (3L, 1L, 30L, 1, 1.0, "1995-06-01"), // late, sole supplier
      (4L, 1L, 40L, 1, 1.0, "1995-06-01"), // late, order not F
      (4L, 1L, 50L, 2, 1.0, "1995-01-15"))))
    write(dir, "supplier", supplierDf(Seq(10L, 20L, 30L, 40L, 50L)))
    val got = TpchExtra.q_tpch_q21(spark, dir).collect()
    assert(got.length == 1, s"expected exactly one waiting supplier, got ${got.toSeq}")
    assert(got(0).getString(0) == "Supplier#010" && got(0).getLong(1) == 1L)
  }

  test("q_tpch_q13: customers with no qualifying order land in the zero bucket") {
    val dir = mkDir()
    val customers = spark.createDataFrame(
      Seq(1L, 2L, 3L).map(k => Row(k, s"c$k", 1, 0.0, "SEG")).asJava,
      StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))
    write(dir, "customer", customers)
    // customer 1: two kept orders; customer 2: only a 1-URGENT order
    // (excluded -> zero bucket); customer 3: no orders at all
    write(dir, "orders", ordersDf(Seq(
      (1L, 1L, "O", 0.0, "1995-01-01", "3-MEDIUM"),
      (2L, 1L, "O", 0.0, "1995-01-01", "5-LOW"),
      (3L, 2L, "O", 0.0, "1995-01-01", "1-URGENT"))))
    val got = TpchExtra.q_tpch_q13(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(2L -> 1L, 0L -> 2L),
      s"distribution wrong: $got (want {2 orders -> 1 customer, 0 -> 2})")
  }

  test("q_tpch_q22: the average boundary is strict and recent orders exclude") {
    val dir = mkDir()
    // nation 1 customers, balances 100.00 / 200.00 / 300.00 -> avg 200.00:
    // cust 1 (100) below, cust 2 (200) AT the boundary (strict > excludes),
    // cust 3 (300) above. cust 4 (nation 2) outside the code set.
    // cust 5 (400, nation 1) above average but has a recent order.
    val customers = spark.createDataFrame(
      Seq((1L, 1, 100.0), (2L, 1, 200.0), (3L, 1, 300.0),
        (4L, 2, 999.0), (5L, 1, 400.0)).map { case (k, n, b) =>
        Row(k, s"c$k", n, b, "SEG") }.asJava,
      StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))
    write(dir, "customer", customers)
    write(dir, "orders", ordersDf(Seq(
      (1L, 5L, "O", 0.0, "2000-06-01", "3-MEDIUM"), // recent: excludes cust 5
      (2L, 3L, "O", 0.0, "1995-01-01", "3-MEDIUM")))) // old: cust 3 stays
    val got = TpchExtra.q_tpch_q22(spark, dir).collect()
    // avg over positives incl. cust 5: (100+200+300+400)/4 = 250 -> only
    // 300 and 400 clear it; 400 has a recent order -> cust 3 alone
    assert(got.length == 1 && got(0).getInt(0) == 1 &&
      got(0).getLong(1) == 1L && got(0).getDouble(2) == 300.0,
      s"wrong Q22 selection: ${got.toSeq}")
  }

  test("q_tpch_q20: exactly one eighth of a part's volume does not qualify") {
    val dir = mkDir()
    val part = spark.createDataFrame(
      Seq(Row(1L, "p", "B", "PROMO", 1, 1.0)).asJava,
      StructType(Seq(
        StructField("p_partkey", LongType), StructField("p_name", StringType),
        StructField("p_brand", StringType), StructField("p_type", StringType),
        StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))))
    write(dir, "part", part)
    // part 1 total 80 qty-units: supplier 10 ships 10 (exactly 1/8 —
    // strict > excludes), supplier 20 ships 11 (> 1/8 — qualifies),
    // supplier 30 the remaining 59
    write(dir, "lineitem", lineitemDf(Seq(
      (1L, 1L, 10L, 1, 10.0, "1995-01-01"),
      (2L, 1L, 20L, 1, 11.0, "1995-01-01"),
      (3L, 1L, 30L, 1, 59.0, "1995-01-01"))))
    write(dir, "supplier", supplierDf(Seq(10L, 20L, 30L)))
    val got = TpchExtra.q_tpch_q20(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == Set(20L, 30L), s"wrong dominant suppliers: $got (10 sits exactly at 1/8)")
  }
}
