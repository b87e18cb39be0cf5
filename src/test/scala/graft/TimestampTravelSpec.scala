package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TxTable

/** Time travel by TIMESTAMP ([[graft.tables.TxTable.versionAt]] /
  * `readAt` — Delta's `timestampAsOf`): resolution against recorded
  * commit times, the monotonic-envelope rule under clock skew, the
  * loud pre-history refusal, and the legacy-manifest mtime fallback. */
class TimestampTravelSpec extends AnyFunSuite with SparkFixture {

  private def keyed(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("k").withColumn("v", col("k") * 10).repartition(1)
  }

  private def ks(t: TxTable, v: Int): Seq[Long] = {
    import spark.implicits._
    t.read(spark, Some(v)).select("k").as[Long].collect().toSeq.sorted
  }

  /** Table whose commits land at a scripted clock. */
  private def tableAt(times: Long*): TxTable = {
    val t = new TxTable(Files.createTempDirectory("graft_tstravel").toString, Seq("k"))
    val it = Iterator(times: _*)
    t.clockMs = () => it.next()
    times.indices.foreach(i => t.append(spark, keyed(i * 10L, i * 10L + 10L)))
    t
  }

  test("versionAt resolves the greatest version at-or-before the ask; readAt reads it") {
    val t = tableAt(1000L, 2000L, 3000L)
    assert(t.versionAt(1000L) == 1)
    assert(t.versionAt(1500L) == 1)
    assert(t.versionAt(2000L) == 2)
    assert(t.versionAt(999999L) == 3, "after the last commit resolves to latest")
    import spark.implicits._
    assert(t.readAt(spark, 2500L).select("k").as[Long].collect().sorted.toSeq
      == (0L until 20L), "readAt must read the resolved version's state")
  }

  test("asking before the first commit refuses loudly") {
    val t = tableAt(1000L, 2000L)
    val e = intercept[IllegalArgumentException](t.versionAt(999L))
    assert(e.getMessage.contains("predates the first commit"))
  }

  test("clock skew: a commit recorded EARLIER than its predecessor inherits its time") {
    // v3 records 2500 < v2's 3000 — the monotonic envelope makes v3
    // effective at 3000, so resolution never contradicts version order
    val t = tableAt(1000L, 3000L, 2500L)
    assert(t.versionAt(2500L) == 1, "the skewed timestamp must not surface v3 early")
    assert(t.versionAt(2999L) == 1)
    assert(t.versionAt(3000L) == 3, "at the envelope time the LATEST such version wins")
  }

  test("legacy manifests without commitms fall back to file mtime") {
    val t = tableAt(1000L, 2000L)
    // strip the commitms line from v1's manifest — the pre-timestamp format
    val m = java.nio.file.Paths.get(t.root, "_txlog", "v00000001.txt")
    import scala.jdk.CollectionConverters._
    val stripped = Files.readAllLines(m).asScala.filterNot(_.startsWith("commitms"))
    Files.write(m, stripped.mkString("\n").getBytes("UTF-8"))
    // mtime is NOW (far beyond 2000): the envelope lifts v1 to mtime and
    // v2 inherits it — resolution still works, ordered, loudly pre-history
    val now = System.currentTimeMillis()
    assert(t.versionAt(now + 60000L) == 2)
    intercept[IllegalArgumentException](t.versionAt(999L))
  }

  test("restore interplay: a time before the restore resolves the pre-restore state") {
    val t = new TxTable(Files.createTempDirectory("graft_tstravel2").toString, Seq("k"))
    val it = Iterator(1000L, 2000L, 3000L)
    t.clockMs = () => it.next()
    t.append(spark, keyed(0, 10))   // v1 @1000
    t.delete(spark, "k", 0, 4)      // v2 @2000
    t.restore(1)                    // v3 @3000
    assert(t.versionAt(2500L) == 2)
    assert(ks(t, t.versionAt(2500L)) == (5L until 10L), "pre-restore state")
    assert(ks(t, t.versionAt(3000L)) == (0L until 10L), "post-restore state")
  }
}
