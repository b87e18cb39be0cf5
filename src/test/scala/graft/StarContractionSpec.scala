package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ConnectedComponents, StarContraction}

/** [[StarContraction]] vs [[ConnectedComponents.minLabel]]: the two CC
  * algorithms must produce IDENTICAL labelings — component = smallest
  * member id — on hand-built shapes (path, cycle, star, forest,
  * isolates) and on randomized graphs (the differential harness: seeded
  * xxhash64 edge generation, so failures replay). Star contraction's
  * selling point is round count on LONG CHAINS, where min-flooding pays
  * O(diameter): the path case pins that it converges well inside the
  * alternation budget a 127-hop chain would blow under flooding. */
class StarContractionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def both(vertices: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
    val v = vertices.toDF("id")
    val e = edges.toDF("a", "b")
    val star = labelsOf(StarContraction.components(v, "id", e, "a", "b"))
    val flood = labelsOf(ConnectedComponents.minLabel(v, "id", e, "a", "b", maxIter = 256))
    assert(star == flood, s"star $star != flood $flood")
  }

  test("path, cycle, star, forest, isolates — identical labelings") {
    both(0L to 9L, (0L to 8L).map(i => (i, i + 1)))          // one path
    both(0L to 5L, Seq((0L, 1L), (1L, 2L), (2L, 0L), (4L, 5L))) // cycle + edge + isolate 3
    both(0L to 6L, (1L to 6L).map(i => (0L, i)))             // star from 0
    both(0L to 7L, Seq((7L, 3L), (3L, 5L), (1L, 2L)))        // forest, reversed ids
  }

  test("a 127-node chain converges inside the log-squared alternation budget") {
    val n = 127L
    val v = (0L until n).toDF("id")
    val e = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    // maxIter 32 alternations << 127 flooding rounds: diameter-proofness
    val got = labelsOf(StarContraction.components(v, "id", e, "a", "b", maxIter = 32))
    assert(got == (0L until n).map(_ -> 0L).toMap)
  }

  test("scale: a million-edge, million-diameter path converges inside the log² budget with no driver-side edges") {
    // the pathological input for min-flooding: one path of 10⁶+1 nodes —
    // diameter 10⁶, so flooding would need 10⁶ rounds. Star contraction
    // must finish within the O(log² n) alternation budget; with
    // n = 2²⁰ nodes, ⌈log₂ n⌉ = 20 and the paper's practical constant
    // keeps real runs well under 2·log₂ n. Edges are GENERATED on the
    // cluster side (spark.range) and the verification is AGGREGATE-only:
    // no edge list or label list is ever collected to the driver — the
    // loop's driver state is one integer per alternation.
    val n = 1000001L
    val v = spark.range(n).toDF("id")
    val e = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1L).as("b"))
    val (labels, rounds) = StarContraction.componentsCounted(
      v, "id", e, "a", "b", maxIter = 40)
    assert(rounds <= 40, s"blew the log² alternation budget: $rounds")
    // one component rooted at 0, every node labeled — checked as ONE
    // aggregate row, never a collected labeling
    val row = labels.agg(
      count(lit(1)).as("n"),
      countDistinct(col("component")).as("nc"),
      max(col("component")).as("mx")).head()
    assert(row.getLong(0) == n && row.getLong(1) == 1L && row.getLong(2) == 0L,
      s"wrong labeling summary: $row (rounds=$rounds)")
  }

  test("randomized differential: seeded sparse graphs agree with min-label") {
    for (seed <- 1 to 4) {
      val n = 300
      val edges = spark.range(450)
        .selectExpr(
          s"pmod(xxhash64(id, $seed), $n) AS a",
          s"pmod(xxhash64(id, ${seed + 100}), $n) AS b")
        .filter(col("a") =!= col("b"))
      val v = spark.range(n).toDF("id")
      val star = labelsOf(StarContraction.components(v, "id", edges, "a", "b"))
      val flood = labelsOf(ConnectedComponents.minLabel(v, "id", edges, "a", "b", maxIter = 256))
      assert(star == flood, s"seed $seed: star and flood disagree")
    }
  }
}
