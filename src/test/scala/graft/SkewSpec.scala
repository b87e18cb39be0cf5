package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling under a synthetic hot key (SURVEY §4 scale hazard): the
  * salted plans must return exactly the unsalted results while bounding
  * the share of any one key group that a single reducer sees. */
class SkewSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val salts = 8

  // 50k rows for the hot key, 100 for each of 50 cold keys
  private lazy val skewed = spark.range(0, 50000).select(
      lit(0L).as("key"), col("id").as("rid"), (col("id") % 7).cast("double").as("v"))
    .unionAll(spark.range(0, 5000).select(
      (col("id") % 50 + 1).as("key"), (col("id") + 100000).as("rid"),
      lit(1.0).as("v")))

  test("saltedAgg == plain groupBy aggregation on skewed data") {
    val plain = skewed.groupBy(col("key").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .orderBy(col("k")).collect().toSeq
    val salted = Salting.saltedAgg(skewed, col("key"), col("rid"), salts, col("v"))
      .orderBy(col("k")).collect().toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin == plain join on skewed data") {
    val dim = (0L to 50L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val plain = skewed.join(dim, col("key") === col("dk"))
      .select(col("rid"), col("name")).orderBy(col("rid")).collect().toSeq
    val salted = Salting.saltedJoin(skewed, dim, col("key"), col("dk"), col("rid"), salts)
      .select(col("rid"), col("name")).orderBy(col("rid")).collect().toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("salting bounds the hot key's share of any single reducer") {
    val parts = 64 // more reducers than salts so salt groups rarely collide
    // shuffle by the raw key: the hot key's 50k rows land on ONE reducer
    val perPartPlain = skewed.repartition(parts, col("key"))
      .mapPartitions(it => Iterator.single(it.size)).collect().max
    // shuffle by (key, salt): they spread over `salts` reducers
    val perPartSalted = skewed.withColumn("_salt", Salting.saltCol(col("rid"), salts))
      .repartition(parts, col("key"), col("_salt"))
      .mapPartitions(it => Iterator.single(it.size)).collect().max
    assert(perPartPlain >= 50000, s"hot key should concentrate, got $perPartPlain")
    // 50k hot rows over 8 salts ≈ 6.25k per group ± collisions and riders
    assert(perPartSalted < 20000, s"salted max partition $perPartSalted not bounded")
  }

  test("AQE skew-join splitting engages on the raw skewed sort-merge join") {
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val right = spark.range(0, 51).select(col("id").as("dk"), lit("x").as("name"))
      val joined = skewed.join(right, col("key") === col("dk"))
      // collect() (not count()) so THIS queryExecution runs and AQE finalizes
      assert(joined.collect().length == 55000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split absent in:\n$plan")
    } finally {
      old.foreach { case (k, v) =>
        v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
      }
    }
  }
}
