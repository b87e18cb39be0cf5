package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.ReportSinkAccess
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DSv2 sink's commit protocol: a real df.write publishes exactly
  * the input rows behind a manifest; a losing task attempt's staged file
  * never lands (the retry/speculation case the scheduler can't be forced
  * to produce deterministically, driven directly through the writer API);
  * a job-level abort leaves nothing visible. */
class ReportSinkSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_sink").toString

  private def lines(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    val manifest = Files.readAllLines(d.resolve("_MANIFEST")).asScala.filter(_.nonEmpty)
    manifest.flatMap(f => Files.readAllLines(d.resolve(f)).asScala).toSeq
  }

  test("df.write end-to-end: manifest + per-partition files hold exactly the input") {
    val out = tmp()
    val df = spark.read.format("graft.sources.GenSource")
      .option("rows", "1000").option("parts", "4").load()
      .select(col("id"), col("event_type"))
    df.write.format("graft.sources.ReportSink")
      .option("path", out).mode("append").save()
    val got = lines(out).map { l =>
      val Array(id, t) = l.split('|'); (id.toLong, t)
    }.sorted
    val want = df.as[(Long, String)].collect().toSeq.sorted
    assert(got == want)
    assert(Files.readAllLines(Paths.get(out, "_MANIFEST")).asScala
      .count(_.nonEmpty) == 4)
    // nothing left staged after publish
    val staging = Paths.get(out, "_staging")
    assert(!Files.exists(staging) || !Files.list(staging).iterator().hasNext)
  }

  test("losing task attempt never lands: only the committed attempt's file publishes") {
    val out = tmp()
    val schema = StructType(Seq(StructField("id", LongType)))
    def row(v: Long) = new GenericInternalRow(Array[Any](v))
    // two attempts of partition 0 run side by side (retry/speculation)
    val w1 = ReportSinkAccess.writer(out, schema, 0, taskId = 1L)
    val w2 = ReportSinkAccess.writer(out, schema, 0, taskId = 2L)
    w1.write(row(11L)); w2.write(row(99L))
    val winner = w1.commit() // Spark decides attempt 1 won...
    w2.abort()               // ...and aborts the loser
    ReportSinkAccess.batchWrite(out, schema).commit(Array(winner))
    assert(lines(out) == Seq("11"))
    assert(!Files.exists(Paths.get(out, "_staging", "p0-t2")))
  }

  test("job-level abort leaves no manifest and no staged files") {
    val out = tmp()
    val schema = StructType(Seq(StructField("id", LongType)))
    val w = ReportSinkAccess.writer(out, schema, 0, taskId = 7L)
    w.write(new GenericInternalRow(Array[Any](5L)))
    val msg = w.commit()
    val bw = ReportSinkAccess.batchWrite(out, schema)
    bw.abort(Array(msg))
    assert(!Files.exists(Paths.get(out, "_MANIFEST")))
    assert(!Files.exists(Paths.get(out, "_staging", "p0-t7")))
  }
}
