package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Restart-from-checkpoint semantics — the fault-tolerance contract the
  * equivalence tests can't see: a stateful query killed after half the
  * input must, on restart against the SAME checkpoint, (a) restore its
  * GroupState (the first post-restart sample per key pairs with the last
  * pre-restart one — rates across the boundary are exact, not reset),
  * (b) never reprocess the files the checkpoint already committed
  * (exactly-once sink: no duplicate rows), and (c) end bit-equal to the
  * oracle-checked batch twin over the full input. This is the recovery
  * path a production run exercises on every executor loss or deploy. */
class StreamRestartSpec extends AnyFunSuite with SparkFixture {

  test("counter->rate restart: state restored, no reprocessing, union == batch twin") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val src = s"$base/src"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .withColumn("ts_us", unix_micros(col("ts")))
      .persist()
    // global time cut: every user's pre-cut samples land in file A, so the
    // restart boundary splits each user's series mid-stream (ties in ts_us
    // can't straddle the cut)
    val cut = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    def half(pred: org.apache.spark.sql.Column) =
      ev.filter(pred).drop("ts_us").coalesce(1).write.mode("append").parquet(src)
    half(col("ts_us") <= cut)

    def run(): Unit = {
      val q = StreamOps.counterToRate(spark.readStream.schema(sch).parquet(src))
        .toDF()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish within 120s")
    }
    run()
    val afterA = spark.read.parquet(out).count()
    assert(afterA > 0, "first run emitted nothing")

    half(col("ts_us") > cut) // the data that arrives while the query is down
    run() // SAME checkpoint: resumes from committed offsets

    val streamed = spark.read.parquet(out)
      .select(col("user_id"), col("event_id"), col("delta"), col("dt_us"))
    val batch = SparkEntry.queries("q_win_lag")(spark, sf)
      .filter(col("delta").isNotNull)
      .select(col("user_id"), col("event_id"), col("delta"), col("dt_us"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    // (c) full equality — which requires (a): the cross-boundary rate rows
    // exist ONLY if the last-sample state survived the restart
    assert(sorted(streamed) == sorted(batch))
    // (b) exactly-once: count equality means run 2 added only new rows
    assert(afterA < batch.count(), "run 1 unexpectedly saw everything")
    ev.unpersist()
  }

  test("cusum chart restart: chart state survives the checkpoint boundary") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (mu0, kap, h) = (5000L, 500L, 25000L)
      val base = java.nio.file.Files.createTempDirectory("graft_restart_cusum").toString
      val src = s"$base/src"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
      val sch = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("value", DoubleType)))
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .withColumn("ts_us", unix_micros(col("ts")))
        .persist()
      val cut = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
      def half(pred: org.apache.spark.sql.Column) =
        ev.filter(pred).drop("ts_us").coalesce(1).write.mode("append").parquet(src)
      half(col("ts_us") <= cut)

      def run(): Unit = {
        val q = StreamOps.cusumStream(spark.readStream.schema(sch).parquet(src),
            mu0, kap, h).toDF()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            b.write.mode("append").parquet(s"$out/batch_$id"); ()
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000), "stream did not finish within 120s")
      }
      run()
      half(col("ts_us") > cut)
      run() // SAME checkpoint: S+/S-/alarm state must carry over

      // latest emission per user (max n) must equal the exact Page fold
      // over the user's FULL series — true only if the chart state
      // (not just the offsets) survived the restart
      val fin = spark.read.parquet(s"$out/*")
        .as[(Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          val last = rs.maxBy(_._2); (u, last._2, last._3, last._4, last._5)
        }.toSet
      def fold(rows: Seq[(Long, Long, Long)]): (Long, Long, Long, Long) = {
        var (pos, neg, alarms, n) = (0L, 0L, 0L, 0L)
        for ((_, _, c) <- rows.sortBy(r => (r._1, r._2))) {
          pos = math.max(0L, pos + (c - mu0 - kap))
          neg = math.max(0L, neg + (mu0 - kap - c))
          if (pos > h || neg > h) { alarms += 1; pos = 0L; neg = 0L }
          n += 1
        }
        (n, pos, neg, alarms)
      }
      val series = ev
        .select(col("user_id"), col("ts_us"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(r => (r._2, r._3, r._4)).toSeq }
      val want = series.map { case (u, rows) =>
        val f = fold(rows); (u, f._1, f._2, f._3, f._4)
      }.toSet
      assert(fin == want)
      // non-vacuity: a chart rebuilt from only the post-restart half must
      // differ for at least one user — otherwise this test can't tell a
      // carried state from a reset one
      val resetWant = series.map { case (u, rows) =>
        val tail = rows.filter(_._1 > cut)
        val f = fold(tail); (u, fold(rows)._1, f._2, f._3, f._4)
      }.toSet
      assert(resetWant != want, "cut produced no cross-boundary drift")
      ev.unpersist()
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("autocorr restart: lag state and running sums survive the checkpoint boundary") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_restart_acf").toString
      val src = s"$base/src"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
      val sch = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("value", DoubleType)))
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .withColumn("ts_us", unix_micros(col("ts")))
        .persist()
      val cut = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
      def half(pred: org.apache.spark.sql.Column) =
        ev.filter(pred).drop("ts_us").coalesce(1).write.mode("append").parquet(src)
      half(col("ts_us") <= cut)

      def run(): Unit = {
        val q = StreamOps.autocorrStream(spark.readStream.schema(sch).parquet(src))
          .toDF()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            b.write.mode("append").parquet(s"$out/batch_$id"); ()
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000), "stream did not finish within 120s")
      }
      run()
      half(col("ts_us") > cut)
      run() // SAME checkpoint: prevY + the six sums must carry over

      // latest emission per user (max m) must equal the batch twin's
      // exact integers over the FULL series — true only if BOTH the lag
      // element and the running sums survived the restart (the pair that
      // spans the cut is in acf_num only via the carried prevY)
      val fin = spark.read.parquet(s"$out/*")
        .as[(Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          val last = rs.maxBy(_._2); (u, last._2, last._3, last._4, last._5)
        }.filter(r => r._4 > 0 && r._5 > 0).toSet
      val want = graft.queries.Analytics9.q_ts_autocorr(spark, sf)
        .select(col("user_id"), col("m"), col("acf_num"), col("dx"), col("dy"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(fin == want)
      // non-vacuity: dropping every cross-cut pair must change at least
      // one user's statistics — otherwise carried and reset state are
      // indistinguishable here
      val resetWant = ev
        .select(col("user_id"), col("ts_us"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("y"))
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          val tail = rs.toSeq.filter(_._2 > cut).sortBy(r => (r._2, r._3)).map(_._4)
          val xy = if (tail.isEmpty) Seq.empty else tail.zip(tail.tail)
          (u, xy.size.toLong)
        }.toMap
      assert(want.exists { case (u, m, _, _, _) => resetWant.get(u).exists(_ != m) },
        "cut produced no cross-boundary lag pair")
      ev.unpersist()
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
