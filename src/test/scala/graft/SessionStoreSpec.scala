package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the timer+state COMPOSITION ([[StreamOps.SessionStoreProcessor]]:
  * ListState session buffer + event-time timers + watermark sweeps) on
  * constructed multi-batch input — sessions emit exactly when the
  * watermark closes them, expired keys hold NO state (a later event
  * starts fresh), open sessions never emit — and its bit-equality
  * against the batch gap-sessionization twin. Also pins ListState
  * TTL-config semantics two-sided (1 ms TTL drops carried state between
  * batches; 1 h TTL keeps it) — the store-enforced expiry tier next to
  * the processor-driven one. */
class SessionStoreSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val B = 1704067200000000L // µs, ms-aligned
  private def s(sec: Long) = B + sec * 1000000L

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val old = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally old match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  /** Write each batch as one time-ordered parquet file for
    * maxFilesPerTrigger=1 replay. Rows: (user_id, event_id, ts_us, value). */
  private def replayDir(batches: Seq[Seq[(Long, Long, Long, Double)]]): String = {
    val src = Files.createTempDirectory("graft_session_replay").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_session_stage$i").toString
      rows.toDF("user_id", "event_id", "ts_us", "value")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("ts_us")).as("ts"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.toString.endsWith(".parquet")) {
          Files.move(p, Paths.get(src, f"b$i%02d.parquet"),
            StandardCopyOption.ATOMIC_MOVE)
          moved = true
        }
      }
      assert(moved, s"no parquet part written for batch $i")
    }
    src
  }

  private def stream(src: String): DataFrame = spark.readStream
    .schema("user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE")
    .option("maxFilesPerTrigger", "1").parquet(src)

  // gap 60 s, watermark delay 10 s; ids unique per event
  // u1: [0,30] closes 90 ✓ (swept when the 200 event arrives, wm 90);
  //     [200] closes 260 > 190 → stays open, never emits
  // u2: 0,50,100 → ONE session (both gaps = 50 ≤ 60) closes 160 ✓ (timer)
  // u3: [0] closes 60 ✓ (timer)
  // u4: 0,65 → TWO sessions in one batch (gap 65 > 60); both close ≤ 125 ✓
  // u5: [0] closes 60 ✓, then 150 arrives AFTER the sweep cleared it —
  //     fresh session [150] closes 210 > 190 → open, never emits
  private val batches = Seq(
    Seq((1L, 101L, s(0), 0.0), (1L, 102L, s(30), 30.0),
      (2L, 201L, s(0), 0.0), (2L, 202L, s(50), 50.0),
      (3L, 301L, s(0), 0.0),
      (4L, 401L, s(0), 0.0), (4L, 402L, s(65), 65.0),
      (5L, 501L, s(0), 0.0)), // wm -> 55 s
    Seq((2L, 203L, s(100), 100.0)), // wm -> 90 s
    Seq((1L, 103L, s(200), 200.0), (5L, 502L, s(150), 150.0))) // wm -> 190 s

  test("session store: sessions emit when the watermark closes them; expired state is gone; open sessions don't emit") {
    val src = replayDir(batches)
    withRocksDb {
      val q = StreamOps.sessionStoreStream(stream(src),
          gapUs = 60000000L, watermark = "10 seconds")
        .toDF()
        .writeStream.format("memory").queryName("session_sink")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
      val got = spark.table("session_sink")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, s(0), s(30), 2L, 3000L),
        (2L, s(0), s(100), 3L, 15000L),
        (3L, s(0), s(0), 1L, 0L),
        (4L, s(0), s(0), 1L, 0L),
        (4L, s(65), s(65), 1L, 6500L),
        (5L, s(0), s(0), 1L, 0L)), s"got $got")
    }
  }

  test("session store equals the batch gap-sessionization twin on watermark-closed sessions") {
    val src = replayDir(batches)
    val streamed = withRocksDb {
      val q = StreamOps.sessionStoreStream(stream(src),
          gapUs = 60000000L, watermark = "10 seconds")
        .toDF()
        .writeStream.format("memory").queryName("session_twin_sink")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
      spark.table("session_twin_sink")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    }
    // batch twin: gap-split per user, fold values in (ts, event_id) order,
    // keep sessions the FINAL watermark (max ts - 10 s) closes
    val finalWmMs = (batches.flatten.map(_._3).max - 10000000L) / 1000L
    val all = batches.flatten.toDF("user_id", "event_id", "ts_us", "value")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val twin = all
      .withColumn("gap_break",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 60000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("gap_break")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n"),
        floor(lit(100.0) * expr("""aggregate(
          transform(array_sort(collect_list(struct(ts_us, event_id, value))), t -> t.value),
          CAST(0.0 AS DOUBLE), (s, x) -> s + x)""")).as("sum_bp"))
      .filter((col("end_us") + 60000000L) / 1000L <= finalWmMs)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"), col("sum_bp"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == twin, s"stream $streamed\nvs twin $twin")
  }

  test("ListState TTL: 1 ms TTL drops carried rows between batches; 1 h TTL keeps them") {
    // One AvailableNow run, maxFilesPerTrigger=1 → the two files land in
    // two micro-batches whose wall-clock separation (batch planning +
    // RocksDB commit, 100s of ms) dwarfs the 1 ms TTL. Processing-time
    // mode keeps scheduling batches after the data drains (the query
    // never self-terminates), so poll the sink for both probe rows and
    // stop explicitly.
    def probes(ttl: java.time.Duration, sink: String): Map[Long, Long] = {
      val src = replayDir(Seq(
        Seq((7L, 701L, s(0), 1.0), (7L, 702L, s(1), 2.0), (7L, 703L, s(2), 3.0)),
        Seq((7L, 704L, s(60), 4.0))))
      withRocksDb {
        val q = StreamOps.ttlProbeStream(stream(src), ttl)
          .toDF()
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (spark.table(sink).count() < 2 && System.nanoTime() < deadline)
          Thread.sleep(200)
        q.stop()
        q.awaitTermination(30000)
        val rows = spark.table(sink).as[(Long, Long, Long)].collect()
        assert(rows.length == 2, s"expected 2 probe rows, got ${rows.toSeq}")
        rows.map { case (_, seq, carried) => seq -> carried }.toMap
      }
    }
    val shortTtl = probes(java.time.Duration.ofMillis(1), "ttl_short_sink")
    assert(shortTtl(1L) == 0L)
    assert(shortTtl(2L) == 0L, s"1 ms TTL must expire batch-1 rows, got $shortTtl")
    val longTtl = probes(java.time.Duration.ofHours(1), "ttl_long_sink")
    assert(longTtl(1L) == 0L)
    assert(longTtl(2L) == 3L, s"1 h TTL must carry batch-1 rows, got $longTtl")
  }
}
