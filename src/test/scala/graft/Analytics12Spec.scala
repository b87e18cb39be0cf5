package graft

import graft.queries.Analytics12
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.28 additions plus
  * constructed fixtures for the two factored mechanisms (censored
  * hazard on staggered lifetimes; CUPED θ=1 exact-cancellation). */
class Analytics12Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val DayUs = 86400000000L

  private lazy val events: Seq[(Long, Long, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("q_survival_hazard equals a plain-Scala censored KM fold") {
    val spans = events.groupBy(_._1).toSeq.map { case (_, rows) =>
      val days = rows.map(r => Math.floorDiv(r._2, DayUs))
      (days.min, days.max)
    }
    val dmax = spans.map(_._2).max
    val lts = spans.map { case (fd, ld) => (ld - fd, ld == dmax) }
    val want = lts.groupBy(_._1).toSeq.map { case (k, rs) =>
      val atRisk = lts.count(_._1 >= k).toLong
      val ends = rs.count(!_._2).toLong
      (k, atRisk, ends, 10000L * ends / atRisk)
    }.sortBy(_._1)
    val got = Analytics12.q_survival_hazard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: censoring bites — some lifetime has ends strictly
    // below its cohort size
    assert(want.exists(r => r._3 == 0 && r._2 > 0))
  }

  test("hazardOf: staggered lifetimes with a censored tail, hand-derived") {
    // hosts: two end at k=1, one at k=2; at k=3 one host ENDS on day 43
    // (a real event — the corpus runs to 53) while another reaches day
    // 53 and is censored. at-risk: k1=5, k2=3, k3=2 — so h(3) = 1/2,
    // not 2/2: censoring discounts the numerator, never the denominator
    val spans = Seq((10L, 11L), (20L, 21L), (30L, 32L), (40L, 43L), (50L, 53L))
      .toDF("fd", "ld")
    val got = Analytics12.hazardOf(spans).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 5L, 2L, 4000L), (2L, 3L, 1L, 3333L), (3L, 2L, 1L, 5000L)))
  }

  test("q_tile_pyramid equals a plain-Scala three-level rollup; levels telescope") {
    val pts = events.map(e => ((e._3 * 7919L) % 1024L, (e._3 * 104729L) % 1024L, e._4))
    def level(side: Long) = pts.groupBy(p => (p._1 / side, p._2 / side))
      .map { case ((tx, ty), rs) => (tx, ty, rs.size.toLong, rs.map(_._3).sum) }
    val want = (level(16).map(t => (6, t._1, t._2, t._3, t._4)) ++
      level(64).map(t => (4, t._1, t._2, t._3, t._4)) ++
      level(256).map(t => (2, t._1, t._2, t._3, t._4)))
      .toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = Analytics12.q_tile_pyramid(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // telescoping invariant: every level carries the full corpus
    val byZoom = want.groupBy(_._1).map { case (z, rs) => z -> rs.map(_._4).sum }
    assert(byZoom.values.toSet.size == 1)
  }

  test("q_rec_itemcf equals a plain-Scala basket fold") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val marg = li.groupBy(_._2).map { case (p, rs) => p -> rs.size.toLong }
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }
    val directed = pairs.toSeq.flatMap { case (a, b, n) => Seq((a, b, n), (b, a, n)) }
      .map { case (i, r, n) => (i, r, n, 10000L * n / (marg(i) + marg(r) - n)) }
    val want = directed.groupBy(_._1).toSeq.flatMap { case (item, rs) =>
      rs.sortBy(t => (-t._3, -t._4, t._2)).take(3).zipWithIndex
        .map { case ((_, rec, n, j), i) => (item, i + 1, rec, n, j) }
    }.sortBy(t => (t._1, t._2))
    val got = Analytics12.q_rec_itemcf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: some item has a repeat co-order (n_ab > 1) so the
    // ranking is not purely tie-break order
    assert(want.exists(_._4 > 1))
  }

  test("q_ab_cuped equals a plain-Scala BigInt moment fold") {
    val d0 = events.map(e => Math.floorDiv(e._2, DayUs)).min
    val users = events.groupBy(_._1).toSeq.map { case (u, rows) =>
      val x = rows.filter(r => Math.floorDiv(r._2, DayUs) - d0 < 15).map(_._4).sum
      val y = rows.filter(r => Math.floorDiv(r._2, DayUs) - d0 >= 15).map(_._4).sum
      (u, BigInt(x), BigInt(y), u % 2)
    }
    val nn = BigInt(users.size)
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(r => r._2 * r._3).sum
    val sxx = users.map(r => r._2 * r._2).sum
    val tnum = (nn * sxy - sx * sy).toLong
    val tden = (nn * sxx - sx * sx).toLong
    val want = users.groupBy(_._4).toSeq.map { case (v, rs) =>
      val nV = rs.size.toLong
      val sxV = rs.map(_._2).sum.toLong; val syV = rs.map(_._3).sum.toLong
      val theta = tnum.toDouble / tden.toDouble
      val adj = (syV.toDouble - theta *
        ((nn.toLong * sxV - nV * sx.toLong).toDouble / nn.toLong.toDouble)) / nV.toDouble
      (v, nV, sxV, syV, math.floor(1e6 * theta).toLong,
        math.floor(1e4 * (syV.toDouble / nV.toDouble)).toLong,
        math.floor(1e4 * adj).toLong)
    }.sortBy(_._1)
    val got = Analytics12.q_ab_cuped(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the adjustment moved both variants
    assert(got.forall(r => r._6 != r._7))
  }

  test("cupedOf: hand-derived θ=8/7 pulls the imbalanced variants toward each other") {
    // variant 1 got the better pre-period draw (Σx 800 vs 400), so its
    // raw post mean (500) overstates the treatment. Hand-derivation:
    // N=4, Σx=1200, Σy=1400, Σxy=580000, Σx²=500000 →
    // θ = 640000/560000 = 8/7; adjusted means 2200/7 ≈ 314.29 and
    // 2700/7 ≈ 385.71 — the 300-point raw gap shrinks to 500/7 ≈ 71,
    // and the fractional results sit far from floor boundaries so the
    // e4/e6 pins are robust to the double chain's ulps
    val users = Seq(
      (1L, 100L, 100L, 0L), (2L, 300L, 300L, 0L),
      (3L, 200L, 300L, 1L), (4L, 600L, 700L, 1L))
      .toDF("user_id", "x", "y", "variant")
    val got = Analytics12.cupedOf(users).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq((0L, 1142857L, 2000000L, 3142857L),
      (1L, 1142857L, 5000000L, 3857142L)))
  }
}
