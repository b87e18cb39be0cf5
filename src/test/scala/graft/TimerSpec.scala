package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the event-time-timer semantics of StreamOps.offlineStream on
  * constructed heartbeats replayed as three time-ordered micro-batches:
  * a device is declared offline exactly when the watermark passes its
  * last heartbeat + gap; a heartbeat arriving before its timer fires
  * re-arms it (no false alert for the 80 s silence that ends in a beat
  * AND no missed alert when a later silence does exceed the gap); alive
  * devices emit nothing; declared_at is the deterministic expiry instant,
  * not a wall clock. */
class TimerSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // base instant, µs — divisible by 1000 so ms conversions are exact
  private val B = 1704067200000000L
  private def s(sec: Long) = B + sec * 1000000L

  test("offline detection: timers fire on watermark, re-arm on heartbeat") {
    val src = Files.createTempDirectory("graft_timer").toString
    // gap 60 s, watermark delay 10 s
    // d1: beats 0,30,60,90,200          -> alive (timer 260 s > final wm 190 s)
    // d2: beat 0                        -> offline (last 0,  declared 60 s)
    // d3: beats 0,80                    -> the 80 s beat lands before wm
    //     reaches its 60 s timer, so it RE-ARMS... and then goes offline
    //     anyway (last 80, declared 140 s < 190 s)
    // d4: beats 0,15                    -> offline (last 15, declared 75 s)
    val batches = Seq(
      Seq((1L, s(0)), (1L, s(30)), (1L, s(60)), (2L, s(0)), (3L, s(0)),
        (4L, s(0)), (4L, s(15))), // batch 1: wm -> 50 s
      Seq((1L, s(90)), (3L, s(80))), // batch 2: wm -> 80 s (d3 re-arms first)
      Seq((1L, s(200)))) // batch 3: wm -> 190 s, fires d2/d4/d3
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_timer_stage$i").toString
      rows.toDF("user_id", "ts_us")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
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
    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(src)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamOps.offlineStream(stream, gapUs = 60000000L, watermark = "10 seconds")
        .toDF()
        .writeStream.format("memory").queryName("offline_sink")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
      val got = spark.table("offline_sink")
        .as[(Long, Long, Long)].collect().toSet
      def ms(sec: Long) = (B / 1000L) + sec * 1000L
      assert(got == Set(
        (2L, s(0), ms(60)),
        (4L, s(15), ms(75)),
        (3L, s(80), ms(140))), s"got $got")
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
