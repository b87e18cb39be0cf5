package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.{LogOffset, LogSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the broker-shaped streaming source ([[graft.sources.LogSource]]):
  * partitioned offset bookkeeping, exactly-once restart from the
  * checkpoint (appended segments are consumed once, never re-read),
  * mid-segment batch boundaries, and the offset wire format. */
class LogSourceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val B = 1704067200000000L

  private def rec(id: Long): (Long, Long, Long, Double) =
    (id, B + id * 1000000L, id % 7, id * 1.5)

  /** Drain the topic into a parquet file sink (the memory sink cannot
    * recover from a checkpoint, which is the very thing under test). */
  private def readAll(root: String, ckpt: String, outDir: String): Unit = {
    val q = spark.readStream.format("graft.sources.LogSource")
      .option("path", root).load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
  }

  test("consumes all partitions' segments; restart sees only appended records (exactly-once)") {
    val root = Files.createTempDirectory("graft_log").toString
    val ckpt = Files.createTempDirectory("graft_log_ckpt").toString
    val out = Files.createTempDirectory("graft_log_out").toString
    LogSource.append(root, 0, (0L until 10L).map(rec))
    LogSource.append(root, 0, (10L until 25L).map(rec))
    LogSource.append(root, 1, (100L until 130L).map(rec))

    readAll(root, ckpt, out)
    val got1 = spark.read.parquet(out)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val expect1 = ((0L until 25L) ++ (100L until 130L))
      .map(id => (id, B + id * 1000000L, id % 7, id * 1.5)).sorted
    assert(got1 == expect1)

    // producer appends while the consumer is down; restart from the SAME
    // checkpoint must deliver exactly the new records — no replays, no loss
    LogSource.append(root, 0, (25L until 32L).map(rec))
    LogSource.append(root, 1, (130L until 140L).map(rec))
    LogSource.append(root, 2, (200L until 203L).map(rec)) // new partition appears
    readAll(root, ckpt, out)
    val got2 = spark.read.parquet(out)
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    val expect2 = ((0L until 32L) ++ (100L until 140L) ++ (200L until 203L)).sorted
    assert(got2 == expect2, "restart must consume exactly the appended records once")
  }

  test("planInputPartitions honors mid-segment ranges and skips consumed segments") {
    val root = Files.createTempDirectory("graft_log_mid").toString
    LogSource.append(root, 0, (0L until 10L).map(rec))   // seg base 0
    LogSource.append(root, 0, (10L until 20L).map(rec))  // seg base 10
    LogSource.append(root, 0, (20L until 30L).map(rec))  // seg base 20
    val stream = new graft.sources.LogSourceTestHook(root)
    // range (13, 27]: skips segment 0 entirely, enters segment 1 at 13,
    // crosses into segment 2, stops at 27
    val rows = stream.readRange(Map(0 -> 13L), Map(0 -> 27L))
    assert(rows == (13L until 27L).toSeq, s"got $rows")
    // empty range plans nothing
    assert(stream.planCount(Map(0 -> 5L), Map(0 -> 5L)) == 0)
  }

  test("maxRecordsPerTrigger bounds each micro-batch; a capped run still drains exactly once") {
    val root = Files.createTempDirectory("graft_log_cap").toString
    val ckpt = Files.createTempDirectory("graft_log_cap_ckpt").toString
    LogSource.append(root, 0, (0L until 30L).map(rec))
    val q = spark.readStream.format("graft.sources.LogSource")
      .option("path", root).option("maxRecordsPerTrigger", "10").load()
      .writeStream.format("memory").queryName("log_cap_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
    val ids = spark.table("log_cap_sink")
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(ids == (0L until 30L).toSeq, "capped run must still drain everything, once")
    val batchRows = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(batchRows.length == 3 && batchRows.forall(_ == 10),
      s"expected 3 batches of 10, got $batchRows")
  }

  test("the broker-shaped source feeds the streaming operators unchanged") {
    import graft.streaming.StreamOps
    val root = Files.createTempDirectory("graft_log_ops").toString
    val ckpt = Files.createTempDirectory("graft_log_ops_ckpt").toString
    // one record per minute across two partitions — each lands in four
    // sliding 1h/15min windows
    def minuteRec(id: Long) = (id, B + id * 60000000L, id % 5, id * 0.5)
    LogSource.append(root, 0, (0L until 90L).map(minuteRec))
    LogSource.append(root, 1, (90L until 150L).map(minuteRec))
    val q = StreamOps.slideStream(
        spark.readStream.format("graft.sources.LogSource")
          .option("path", root).load())
      .writeStream.format("memory").queryName("log_slide_sink")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
    val got = spark.table("log_slide_sink")
      .as[(Long, Long)].collect().toSet
    val twin = (0L until 150L).map(id => B + id * 60000000L)
      .flatMap { us =>
        val sec = us / 1000000L
        (0 until 4).map(k => sec / 900L * 900L - k * 900L)
          .filter(ws => sec >= ws && sec < ws + 3600L)
      }
      .groupBy(identity).map { case (ws, hits) => (ws, hits.size.toLong) }.toSet
    assert(got == twin, s"stream $got\nvs twin $twin")
  }

  test("batch face reads the whole retained topic, one split per partition") {
    val root = Files.createTempDirectory("graft_log_batch").toString
    LogSource.append(root, 0, (0L until 12L).map(rec))
    LogSource.append(root, 0, (12L until 20L).map(rec))
    LogSource.append(root, 1, (50L until 65L).map(rec))
    LogSource.append(root, 2, Seq.empty) // empty partition dir plans no split
    val df = spark.read.format("graft.sources.LogSource")
      .option("path", root).load()
    assert(df.rdd.getNumPartitions == 2, "one non-empty split per topic partition")
    val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val expect = ((0L until 20L) ++ (50L until 65L))
      .map(id => (id, B + id * 1000000L, id % 7, id * 1.5)).sorted
    assert(got == expect, "batch face must agree with the producer's records")
  }

  test("offset JSON round-trips with sorted keys") {
    val o = LogOffset(Map(2 -> 7L, 0 -> 12L, 1 -> 0L))
    assert(o.json() == """{"0":12,"1":0,"2":7}""")
    assert(LogOffset.fromJson(o.json()) == o)
    assert(LogOffset.fromJson("{}") == LogOffset(Map.empty))
  }

  test("segments are named by base offset and only the last is counted for the end offset") {
    val root = Files.createTempDirectory("graft_log_base").toString
    LogSource.append(root, 0, (0L until 4L).map(rec))
    LogSource.append(root, 0, (4L until 9L).map(rec))
    val names = Option(Paths.get(root, "p=0").toFile.list()).get.sorted.toSeq
    assert(names == Seq("seg-0000000000000000.log", "seg-0000000000000004.log"))
    val stream = new graft.sources.LogSourceTestHook(root)
    assert(stream.latest() == Map(0 -> 9L))
  }

  test("concurrent producers to one partition never overwrite each other's segment") {
    // Both racers list the same (empty) segment set, compute base 0, and
    // publish: put-if-absent hard-link makes one win seg-0; the loser
    // must recompute the base from the winner's now-visible segment and
    // land at the next offset — an ATOMIC_MOVE publish silently REPLACED
    // the first segment here, losing its records.
    val root = Files.createTempDirectory("graft_log_race").toString
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def racer(lo: Long): java.util.concurrent.Future[java.nio.file.Path] =
      pool.submit { () =>
        gate.await(10, TimeUnit.SECONDS)
        LogSource.append(root, 0, (lo until lo + 10L).map(rec))
      }
    val (a, b) = (racer(0), racer(100))
    gate.countDown()
    a.get(60, TimeUnit.SECONDS); b.get(60, TimeUnit.SECONDS)
    pool.shutdown()
    val names = Option(Paths.get(root, "p=0").toFile.list()).get.sorted.toSeq
    assert(names == Seq("seg-0000000000000000.log", "seg-0000000000000010.log"),
      s"expected two contiguous segments, got $names")
    // all 20 records present exactly once, whatever the race order
    val ids = spark.read.format("graft.sources.LogSource").option("path", root)
      .load().select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 10L) ++ (100L until 110L)).sorted)
  }
}
