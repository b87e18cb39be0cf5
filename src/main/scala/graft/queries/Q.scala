package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Shared determinism helpers (SURVEY.md §2.10).
  *
  * The driver hash-compares parquet output against DuckDB, so every emitted
  * value must be bit-identical across engines:
  *  - never SUM/AVG raw doubles — cast to decimal first (exact,
  *    order-independent addition), and cast the aggregate back to an
  *    explicit decimal type so the Spark result schema (dec(28,2) after
  *    sum) matches DuckDB's (dec(38,2)).
  *  - ratios: exact decimal sum → one double division of identical inputs
  *    → round(…,4). IEEE division and away-from-zero rounding of
  *    non-negative doubles agree across engines.
  */
object Q {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Final-output cast for a decimal SUM: pins precision so both engines
    * emit the same parquet decimal type. */
  def outDec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def outDec4(c: Column): Column = c.cast(DecimalType(18, 4))
  def outDec6(c: Column): Column = c.cast(DecimalType(18, 6))
}
