package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §0.3/§7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` the DuckDB-equivalent SQL for each (omitted only for
  * engine-specific ops like HLL sketches, per the contract). Column names
  * and types are aligned on both sides — the driver sorts columns by name
  * and hash-compares values, and every query ends in a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on sf0.001 (driver smoke-checks rows>0): the 4-way
    * join→agg→sort plan of q_join_inner. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_inner")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Scalars.queries ++
      StreamingTwins.queries ++ LlmOps.queries ++ LlmExt.queries ++
      Analytics.queries ++ Analytics2.queries ++ Analytics3.queries ++
      Analytics4.queries ++ Analytics5.queries ++ Analytics6.queries ++
      TableOps.queries ++ SqlSurface.queries ++ SqlTableOps.queries ++
      Retrieval.queries ++
      TpchExtra.queries ++ Pipeline.queries ++ Analytics7.queries ++
      Analytics8.queries ++ Analytics9.queries ++ Analytics10.queries ++
      Analytics11.queries ++ Analytics12.queries ++ Analytics13.queries ++
      Analytics15.queries ++
      Analytics14.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Windows.oracle ++ Scalars.oracle ++
      StreamingTwins.oracle ++ LlmOps.oracle ++ LlmExt.oracle ++
      Analytics.oracle ++ Analytics2.oracle ++ Analytics3.oracle ++
      Analytics4.oracle ++ Analytics5.oracle ++ Analytics6.oracle ++
      TableOps.oracle ++ SqlSurface.oracle ++ SqlTableOps.oracle ++
      Retrieval.oracle ++
      TpchExtra.oracle ++ Pipeline.oracle ++ Analytics7.oracle ++
      Analytics8.oracle ++ Analytics9.oracle ++ Analytics10.oracle ++
      Analytics11.oracle ++ Analytics12.oracle ++ Analytics13.oracle ++
      Analytics14.oracle ++ Analytics15.oracle
}
