package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H Q4 and Q10 shapes — SURVEY.md §2.19, widening the canonical
  * optimizer surface beyond Q1/Q3/Q5/Q17/Q18: Q4 is THE existential
  * semi-join benchmark (EXISTS decorrelation), Q10 the returned-items
  * top-k join pipeline. Predicates adapt to the synthetic schema (no
  * commit/receipt dates: "late" = shipped > 30 days after order date)
  * with the plan shapes intact. */
object TpchExtra {

  /** TPC-H Q4 shape — order-priority checking: count orders in a
    * 1-year window having at least one late lineitem. The EXISTS
    * subquery is planned as a LEFT SEMI join on orderkey with the
    * lateness comparison as a join residual — each order counted ONCE
    * no matter how many late items (the dedup a correlated EXISTS
    * implies, and exactly what a semi join gives for free: no
    * distinct, no row explosion). Map-combinable count after the semi
    * join; at 100 TB the only data-sized work is the orderkey shuffle
    * of the two filtered scans — the date filter reaches the orders
    * scan, and the priority aggregate runs on the ~order-count frame. */
  def q_tpch_q4(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
      "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q10 shape — returned-item reporting: the revenue a customer
    * cost in returns over a quarter window, top 20. Plan: lineitem
    * filtered to returnflag 'R' joins orders (date-windowed) on
    * orderkey, the revenue aggregate collapses to the customer domain
    * BEFORE the customer join (group-below-join: the join input is the
    * ~custkey-count aggregate, not the fact rows), customer decorates,
    * nation broadcasts, and the top-20 is orderBy+limit —
    * TakeOrderedAndProject. Revenue in decimal; doubles only at
    * emission. */
  def q_tpch_q10(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val rev = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(Q.dec2(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - Q.dec2(col("l_discount")))).as("rev_dec"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    rev.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        Q.dec2(col("c_acctbal")).as("bal_dec"), col("rev_dec"))
      .orderBy(col("rev_dec").desc, col("c_custkey")).limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        Q.outDbl(col("bal_dec")).as("c_acctbal"),
        Q.outDbl(col("rev_dec")).as("revenue"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q4" -> q_tpch_q4 _,
    "q_tpch_q10" -> q_tpch_q10 _,
  )

  val oracle: Map[String, String] = Map(
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q10" ->
      """WITH rev AS (
        |  SELECT o.o_custkey,
        |    sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev_dec
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1995-07-01'
        |  GROUP BY o.o_custkey)
        |SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
        |  CAST(rev_dec AS DOUBLE) AS revenue
        |FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY rev_dec DESC, c.c_custkey LIMIT 20""".stripMargin,
  )
}
