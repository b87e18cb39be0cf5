package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation on known graphs: a chain (tests multi-hop
  * flooding beyond one iteration), a triangle, and singletons. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def run(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = (0L until n).toDF("id")
    val e = edges.toDF("s", "d")
    ConnectedComponents.minLabel(v, "id", e, "s", "d")
      .as[(Long, Long)].collect().toMap
  }

  test("chain components flood the min label across hops") {
    // 0-1-2-3-4 chain plus 5-6, 7 isolated
    val got = run(8, Seq((1L, 0L), (1L, 2L), (3L, 2L), (3L, 4L), (6L, 5L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("triangle plus bridge is one component") {
    val got = run(5, Seq((2L, 1L), (3L, 2L), (1L, 3L), (3L, 4L)))
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("no edges: every vertex is its own component") {
    val got = run(4, Seq.empty)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
