package graft.queries

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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

  /** Rank a TOP-K frame without a window. `top` must already be the
    * ≤k-row result of `orderBy(valueCol.desc, tieCol).limit(k)` (which
    * plans TakeOrderedAndProject — per-partition top-k, driver merge of
    * k·P candidates: the 100 TB shape). rk = 1 + |rows strictly before
    * this one under (valueCol DESC, tieCol ASC)|, computed as a broadcast
    * self-join over the k-row frame (O(k²) comparisons on ≤k rows — never
    * a SinglePartition WindowExec over the data). `tieCol` must be unique
    * within `top`, so this IS row_number under that total order. The
    * caller should `.persist()` `top` if its lineage is expensive: both
    * join sides re-evaluate it otherwise. */
  def rankTopK(top: DataFrame, valueCol: String, tieCol: String): DataFrame = {
    val b = top.select(col(valueCol).as("_rb_v"), col(tieCol).as("_rb_t"))
    top.join(broadcast(b),
        col("_rb_v") > col(valueCol) ||
          (col("_rb_v") === col(valueCol) && col("_rb_t") < col(tieCol)),
        "left")
      .groupBy(top.columns.map(col): _*)
      .agg((count(col("_rb_t")) + lit(1)).cast("int").as("rk"))
  }

  /** Global inclusive running sum of `vCol` in `idCol` order — the
    * two-phase prefix-offset pattern (q_global_rownum's recipe applied to
    * a SUM): range-partition on the total order + partition-local sort
    * (one shuffle, the cost of any global sort), fold the prefix inside
    * each partition via mapPartitions (tier (d): the running value is a
    * property of the physical iterator), lift local sums to global with
    * per-partition totals — a map-combinable P-row aggregate whose prefix
    * window runs on the #partitions frame, NEVER the data — broadcast
    * back. Boundary-independent: range partitions are non-overlapping, so
    * offset + local prefix IS the global prefix wherever the sampled
    * boundaries land. Replaces `sum() OVER (ORDER BY id ROWS UNBOUNDED
    * PRECEDING)`, whose plan moves every row to ONE partition. `idCol`
    * must be unique; both columns are folded as BIGINT. */
  def runningSumById(spark: SparkSession, df: DataFrame, idCol: String,
      vCol: String, endCol: String, parts: Int = 16): DataFrame = {
    import spark.implicits._
    val sorted = df.select(col(idCol).cast("long"), col(vCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
    val local = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var acc = 0L
      it.map { case (id, v) => acc += v; (pid, id, v, acc) }
    }.toDF("pid", idCol, vCol, endCol)
    val offsets = local.groupBy(col("pid")).agg(sum(col(vCol)).as("_psum"))
      .withColumn("_off", coalesce(sum(col("_psum")).over(
        Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("_off"))
    local.join(broadcast(offsets), Seq("pid"))
      .select(col(idCol), col(vCol), (col(endCol) + col("_off")).as(endCol))
  }

  /** Two global running sums in one pass — [[runningSumById]] folding a
    * PAIR of value columns through the same range-partitioned iterator, so
    * coupled ECDFs (two populations over one value domain, q_drift_ks)
    * cost one shuffle + one fold instead of two full chains joined back
    * on the id. Same boundary-independence argument; same pid-frame
    * offsets window (per-partition summary rows, never the data). */
  def runningSums2ById(spark: SparkSession, df: DataFrame, idCol: String,
      v1: String, e1: String, v2: String, e2: String, parts: Int = 16): DataFrame = {
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long"), col(v1).cast("long"), col(v2).cast("long"))
      .as[(Long, Long, Long)]
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
    val local = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var a1 = 0L; var a2 = 0L
      it.map { case (id, x1, x2) => a1 += x1; a2 += x2; (pid, id, x1, x2, a1, a2) }
    }.toDF("pid", idCol, v1, v2, e1, e2)
    val w = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("pid"))
      .agg(sum(col(v1)).as("_p1"), sum(col(v2)).as("_p2"))
      .withColumn("_o1", coalesce(sum(col("_p1")).over(w), lit(0L)))
      .withColumn("_o2", coalesce(sum(col("_p2")).over(w), lit(0L)))
      .select(col("pid"), col("_o1"), col("_o2"))
    local.join(broadcast(offsets), Seq("pid"))
      .select(col(idCol), col(v1), col(v2),
        (col(e1) + col("_o1")).as(e1), (col(e2) + col("_o2")).as(e2))
  }
}
