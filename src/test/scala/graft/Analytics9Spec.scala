package graft

import graft.queries.{Analytics9, LlmExt}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputations of the §2.25 additions, beyond
  * the DuckDB hash gate (the Analytics8Spec discipline): each statistic
  * or structure is rebuilt in plain Scala from collected sf0.001 inputs —
  * a second implementation sharing no Spark expression tree, so an error
  * formulated identically on both engine sides still surfaces here. */
class Analytics9Spec extends AnyFunSuite with SparkFixture {

  // ---- similarity-graph fixture: the pair list collected ONCE, edges
  // rebuilt in plain Scala sets (shared by linkpred + kcore tests)
  private lazy val pairs: Seq[(Long, Long)] = {
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 1000)
    LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }
  private lazy val nbrs: Map[Long, Set[Long]] =
    (pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  test("q_url_canon: canonicalization by string surgery equals part-wise rebuild") {
    val got = Analytics9.q_url_canon(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = docs
      .map { case (id, src) =>
        (s"http://www.$src.example.com/item/${id % 10}?a=${id % 5}&b=${id % 3}", id)
      }
      .groupBy(_._1).toSeq.map { case (u, ds) =>
        (u, ds.size.toLong, ds.map(_._2).min)
      }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: real duplicate groups exist, and the canonical form
    // actually erased case, port, fragment and tracking params
    assert(want.exists(_._2 > 1))
    assert(want.forall { case (u, _, _) =>
      !u.contains("#") && !u.contains("utm_") && !u.contains(":80") &&
        u == u.toLowerCase
    })
  }

  test("q_ts_autocorr equals a plain-Scala BigInt Pearson over lag pairs") {
    val got = Analytics9.q_ts_autocorr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6))).toSeq
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val c = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val xy = c.zip(c.tail) // (prev, cur)
      val m = BigInt(xy.size)
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxy = xy.map(p => BigInt(p._1) * p._2).sum
      val sx2 = xy.map(p => BigInt(p._1) * p._1).sum
      val sy2 = xy.map(p => BigInt(p._2) * p._2).sum
      val num = m * sxy - sx * sy
      val dx = m * sx2 - sx * sx
      val dy = m * sy2 - sy * sy
      if (xy.isEmpty || dx <= 0 || dy <= 0) None
      else Some((u, m.toLong, num.toLong, dx.toLong, dy.toLong,
        num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)),
        num < 0))
    }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: both signs of memory occur on this corpus
    assert(want.exists(_._7) && want.exists(!_._7))
  }

  test("q_graph_linkpred equals brute-force neighbor-set intersection") {
    val got = Analytics9.q_graph_linkpred(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val edgeSet = pairs.toSet
    val nodes = nbrs.keys.toSeq.sorted
    val all = for {
      a <- nodes; b <- nodes if a < b && !edgeSet((a, b))
      common = (nbrs(a) & nbrs(b)).size if common > 0
    } yield {
      val (da, db) = (nbrs(a).size.toLong, nbrs(b).size.toLong)
      (a, b, common.toLong, da, db, 10000L * common / (da + db - common))
    }
    val want = all.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(50)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: predictions exist that are NOT already edges (by
    // construction) and at least one has ≥2 common neighbors
    assert(want.exists(_._3 >= 2))
  }

  test("q_graph_kcore equals an iterative peel run to FIXPOINT") {
    val got = Analytics9.q_graph_kcore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // plain-Scala peel, iterated until stable — if three unrolled rounds
    // were NOT enough on this corpus, this differential fails and the
    // round count must rise
    var es = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    val want = es.groupBy(_._1).toSeq
      .map { case (k, v) => (k, v.size.toLong) }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want)
    // non-vacuity: the peel removed at least one node a raw degree≥2
    // filter would have kept (the leaf-cascade case k-core exists for)
    val deg0 = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val survivors = want.map(_._1).toSet
    assert(deg0.exists { case (n, d) => d >= 2 && !survivors(n) },
      "peeling was vacuous: no degree>=2 node was cascaded out " +
        "(corpus too dense to exercise k-core; tighten minBp)")
  }
}
