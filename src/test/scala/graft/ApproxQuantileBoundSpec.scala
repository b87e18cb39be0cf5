package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative check for the oracle-less sketch quantiles
  * (q_agg_quantile_approx), mirroring the HLL precedent: approx_percentile
  * with accuracy A guarantees the returned value's RANK is within n/A of
  * the target rank q·n. Each approximate quantile must therefore bracket
  * the target rank between (count below) − n/A and (count at-or-below) +
  * n/A of the group's exact sorted values. */
class ApproxQuantileBoundSpec extends AnyFunSuite with SparkFixture {

  test("approx quantiles land within the accuracy rank bound of exact") {
    Tables.ensure(spark)
    val approx = SparkEntry.queries("q_agg_quantile_approx")(spark, sf).collect()
    assert(approx.nonEmpty)
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    for (r <- approx) {
      val et = r.getString(0)
      val vals = byType(et)
      val n = vals.length
      assert(r.getLong(3) == n.toLong)
      for ((q, v) <- Seq((0.5, r.getDouble(1)), (0.9, r.getDouble(2)))) {
        val below = vals.count(_ < v).toDouble
        val atOrBelow = vals.count(_ <= v).toDouble
        val target = q * n
        val eps = n / 10000.0 + 1 // rank slack: accuracy 10000, ±1 discretization
        assert(below - eps <= target && target <= atOrBelow + eps,
          s"$et q=$q value=$v rank∈[$below,$atOrBelow] target=$target n=$n")
      }
    }
  }
}
