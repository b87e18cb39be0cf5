package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raw event record exactly as a broker consumer would deliver it: ts is
  * the ns epoch long, pre-normalization. */
final case class RawEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

/** Second streaming-source implementation (SURVEY §2.8 source seam): the
  * operators must be source-agnostic, not file-coupled. A queue-backed
  * MemoryStream — rows PUSHED by an external system across several
  * micro-batches, the Kafka shape — feeds the same normalization +
  * windowed aggregation and must equal the oracle-checked batch twin. */
class MemorySourceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("queue-backed source through tumbling windows == batch q_stream_tumble") {
    Tables.ensure(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // raw ns-long rows, as a consumer would hand them over — from either
    // generator layout (int64 ns under nanosAsLong, or native timestamp[us],
    // re-widened to ns: a broker delivers epoch integers, not engine types)
    val rawDf = spark.read.parquet(s"$sf/events.parquet")
    val nsDf = rawDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => rawDf
      case _ => rawDf.withColumn("ts",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
    }
    val raw = nsDf.as[RawEvent].collect()
    assert(raw.nonEmpty)
    val source = MemoryStream[RawEvent]
    val agg = StreamOps.normalizeEvents(source.toDF())
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("memsrc_tumble")
      .outputMode("complete").start()
    try {
      // three pushes → at least three micro-batches: state must carry
      // partial windows across batch boundaries
      raw.grouped(raw.length / 3 + 1).foreach { chunk =>
        source.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def sorted(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).sortBy(_.mkString("|"))
    val streamed = sorted(spark.table("memsrc_tumble").collect().toSeq)
    val batch = sorted(SparkEntry.queries("q_stream_tumble")(spark, sf)
      .select("day", "event_type", "n").collect().toSeq)
    assert(streamed == batch)
  }
}
