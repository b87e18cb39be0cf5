package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared determinism helpers (SURVEY.md §2.10).
  *
  * The driver hash-compares parquet output against DuckDB, so every emitted
  * value must be bit-identical across engines AND representation-compatible
  * with the driver's pandas comparator:
  *  - never SUM/AVG raw doubles — cast to decimal first (exact,
  *    order-independent addition). `dec2/dec4/dec6` pin intermediate
  *    precision so products/sums stay exact on both engines.
  *  - NEVER emit a DECIMAL (or array/binary) column in the FINAL output:
  *    DuckDB materializes result decimals as float64 while Spark-written
  *    parquet decimals surface as Python Decimal objects — equal values,
  *    unequal dtype/hash (all 11 round-1 driver reds). Wrap every final
  *    decimal in [[outDbl]]: decimal→double of the same exact value is
  *    round-to-nearest on both engines, hence bit-identical.
  *  - ratios/avgs: floor(10000.0 * x) basis-point quantization, never
  *    round(double, n) (engines round different representations).
  */
object Q {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  /** Final-output cast: exact decimal → DOUBLE (driver-comparator-safe).
    * Apply to every emitted decimal column; mirror `CAST(… AS DOUBLE)` in
    * the oracle. Keep the decimal math *inside* — only the output
    * representation changes. */
  def outDbl(c: Column): Column = c.cast(DoubleType)
}
