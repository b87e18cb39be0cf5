package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for shuffles — the most predictable 100 TB
  * failure mode of this workload: one viral user / ubiquitous token sends
  * its entire key group to a single reducer, and that task's size — not
  * the cluster's — becomes the job's wall clock and OOM bound.
  *
  * Two standard remedies, both exact:
  *
  *  - [[saltedAgg]]: split every key into `salts` sub-keys with a
  *    deterministic salt derived from a per-row column, partially
  *    aggregate per (key, salt), then re-aggregate per key. The first
  *    shuffle's task size for a hot key drops by the salt factor; the
  *    second shuffle moves only `salts` rows per key. Works for any
  *    aggregate with a merge law (the Spark map-side combine already does
  *    this WITHIN a partition; salting extends it ACROSS reducers).
  *
  *  - [[saltedJoin]]: salt the skewed (large) side the same way and
  *    replicate each small-side row once per salt value, joining on
  *    (key, salt). Replication costs |small| × salts rows — the classic
  *    trade against the hot reducer.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles the
  * sort-merge-join case at runtime; salting remains the tool for skewed
  * AGGREGATIONS and for joins AQE won't rewrite. SkewSpec demonstrates
  * both: result equality with the unsalted plan and the bounded
  * per-reducer group size under a synthetic hot key.
  */
object Salting {

  /** Deterministic salt in [0, salts) from an arbitrary per-row column
    * (use a unique id so rows of a hot key spread evenly). */
  def saltCol(from: Column, salts: Int): Column =
    pmod(xxhash64(from), lit(salts.toLong))

  /** Skew-safe `groupBy(key).agg(count, sum(sumExpr))`: two-phase over a
    * salted first shuffle. Exact for count/sum (merge law). */
  def saltedAgg(df: DataFrame, key: Column, saltFrom: Column, salts: Int,
      sumExpr: Column): DataFrame =
    df.withColumn("_salt", saltCol(saltFrom, salts))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(sumExpr).as("_s"))
      .groupBy(col("k"))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("s"))

  /** Skew-safe inner equi-join of a large skewed side with a small side:
    * the large side is salted, the small side replicated across all salt
    * values, and the join runs on (key, salt) so a hot key's rows spread
    * over `salts` reducers. */
  def saltedJoin(large: DataFrame, small: DataFrame, largeKey: Column,
      smallKey: Column, saltFrom: Column, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt", saltCol(saltFrom, salts))
    val replicatedSmall = small
      .withColumn("_salt", explode(typedLit((0L until salts.toLong).toArray)))
    saltedLarge.join(replicatedSmall,
        largeKey === smallKey && saltedLarge("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }
}
