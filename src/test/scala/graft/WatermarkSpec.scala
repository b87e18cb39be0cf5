package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Late-data semantics under a watermark (SURVEY §2.8 design op, made
  * observable): the file-replay equivalence tests process everything in
  * one micro-batch, where nothing is ever late — this spec drives the
  * SAME tumbling aggregation through a MemoryStream across several
  * micro-batches so the watermark actually advances between them, and
  * asserts that a record older than (max event time − watermark delay) is
  * DROPPED while one inside the horizon is still aggregated. */
class WatermarkSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("tumbling aggregation drops data behind the watermark, keeps data inside it") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val counts = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds(col("w.start")).as("ws"), col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName("wm_sink")
      .outputMode("append").start()
    try {
      // batch 1: events up to 12:30 -> watermark will advance to 12:20
      input.addData((t("12:00"), "a"), (t("12:05"), "a"), (t("12:30"), "b"))
      q.processAllAvailable()
      // batch 2: 11:05 is an hour behind the 12:20 watermark -> DROPPED;
      // 12:59 is current; 14:00 pushes the watermark past 13:00 so the
      // 12:00 window can finalize and emit in append mode
      input.addData((t("11:05"), "late"), (t("12:59"), "a"), (t("14:00"), "c"))
      q.processAllAvailable()
      // batch 3: watermark-advancer so every earlier window finalizes
      input.addData((t("16:00"), "z"))
      q.processAllAvailable()
      val rows = spark.table("wm_sink")
        .select(col("ws"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val h12 = t("12:00").getTime / 1000
      // the late 11:05 record must NOT have produced an 11:00-window row
      assert(!rows.exists(_._2 == "late"), s"late record survived: $rows")
      // the in-horizon 12:59 record joined the same finalized window as 12:00/12:05
      assert(rows.contains((h12, "a", 3L)), s"in-horizon record missing: $rows")
      assert(rows.contains((h12, "b", 1L)), s"12:30 'b' window missing: $rows")
    } finally q.stop()
  }
}
