package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE SKEW-JOIN engagement (SURVEY §2's "salting or AQE skew-join"
  * remedy, previously demonstrated only on the manual-salting side):
  * a sort-merge join whose left side piles most rows onto one key is
  * re-planned AT RUNTIME — AQE observes the materialized shuffle stats,
  * marks the join skew=true, and splits the oversized partition into
  * parallel sub-reads. The cluster lesson this pins: with AQE on, a
  * skewed equi-join needs thresholds, not query rewrites — the salting
  * transform (q_join_salted) remains for the aggregation side and for
  * engines/joins AQE cannot split. */
class AqeSkewSpec extends AnyFunSuite with SparkFixture {

  test("a runtime-skewed SMJ is split by AQE: skew=true in the adaptive plan, result exact") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the thresholds so the constructed skew (one hot key with
      // ~200k of 220k rows) is "skewed" at spec scale
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      // keep the join a shuffle join: broadcasting the dim would dodge
      // the very mechanism under test
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 220000).toDF("i")
        .select(when(col("i") < 200000, lit(7L)).otherwise(col("i") % 1000).as("k"),
          col("i").as("payload"))
      val right = spark.range(0, 1000).toDF("k")
        .withColumn("tag", concat(lit("t"), col("k")))
      val joined = left.join(right, "k")
      // materialize THIS queryExecution (count() would plan its own, and
      // the adaptive plan is only final on the execution that ran)
      val n = joined.collect().length
      // exact expected count: hot key 7 -> 200000 rows match; the cold
      // 20000 rows all have k in [0,1000) and match exactly once
      assert(n == 220000)
      val plan = joined.queryExecution.executedPlan.toString
      // AQE repeats the initial plan below a marker; only the final
      // adaptive plan counts (memory: split before asserting)
      val finalPlan = plan.split("== Initial Plan ==").head
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n${finalPlan.take(2000)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
