package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamOps
import graft.tables.TxTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The transactional table layer's STREAMING and MAINTENANCE faces:
  * exactly-once micro-batch ingest via manifest txn watermarks (replayed
  * batches — foreachBatch is at-least-once — are recognized and skipped),
  * small-file compaction that preserves content, time travel, and
  * concurrent-commit safety, and vacuum that reclaims only files no
  * retained version references. */
class TxStreamSinkSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val B = 1704067200000000L

  private def freshTable(): TxTable =
    new TxTable(Files.createTempDirectory("graft_txsink").toString, Seq("user_id"))

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("user_id")
      .withColumn("v", col("user_id") * 3)

  test("streaming ingest into the table is exactly-once end to end") {
    val src = Files.createTempDirectory("graft_txsink_src").toString
    val batches = Seq((0L, 40L), (40L, 70L), (70L, 100L))
    batches.zipWithIndex.foreach { case ((lo, hi), i) =>
      val stage = Files.createTempDirectory(s"graft_txsink_stage$i").toString
      spark.range(lo, hi).toDF("user_id")
        .withColumn("ts", timestamp_micros(lit(B) + col("user_id") * 1000000L))
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
      assert(moved)
    }
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft_txsink_ckpt").toString
    val q = StreamOps.txTableSink(
        spark.readStream
          .schema("user_id BIGINT, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(src)
          .select(col("user_id"), (col("user_id") * 3).as("v")),
        t, "sink_q", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
    // one committed version per micro-batch, watermark at the last batch
    assert(t.currentVersion == 3)
    assert(t.snapshot().txns == Map("sink_q" -> 2L))
    val got = t.read(spark).select(col("user_id"), col("v"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == (0L until 100L).map(u => (u, u * 3)))
    // crash replay: the engine re-delivers an already-committed batchId —
    // the manifest watermark must reject it with no new version
    val replayed = t.appendBatch(spark, rows(70, 100), "sink_q", 2L)
    assert(!replayed, "replayed batch must be skipped")
    assert(t.currentVersion == 3)
    assert(t.read(spark).count() == 100)
    // a genuinely new batch still lands
    assert(t.appendBatch(spark, rows(100, 110), "sink_q", 3L))
    assert(t.read(spark).count() == 110)
    // a different stream's ids are tracked independently
    assert(t.appendBatch(spark, rows(500, 505), "other_q", 0L))
    assert(t.snapshot().txns == Map("sink_q" -> 3L, "other_q" -> 0L))
  }

  test("writeStream.format(\"txtable\") drives the exactly-once sink from the format string") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    source.addData(0L until 40L: _*)
    source.addData(40L until 70L: _*)
    val root = Files.createTempDirectory("graft_txsinkfmt").toString
    val ckpt = Files.createTempDirectory("graft_txsinkfmt_ckpt").toString
    val q = source.toDF().select(col("value").as("user_id"),
        (col("value") * 3).as("v"))
      .writeStream.format("txtable")
      .option("checkpointLocation", ckpt)
      .option("statCols", "user_id")
      .trigger(Trigger.AvailableNow())
      .start(root)
    assert(q.awaitTermination(120000), "stream did not finish")
    val t = TxTable.open(root)
    assert(t.read(spark).count() == 70)
    assert(t.read(spark).agg(sum(col("v"))).head().getLong(0) ==
      (0L until 70L).map(_ * 3).sum)
    // the declared stat column governed the sink's stats pass
    assert(t.snapshot().files.forall(_.mins.contains("user_id")))
    val vBefore = t.currentVersion
    // REPLAYED batch refusal: at-least-once delivery re-offers a batchId
    // the manifest watermark already covers — the sink must skip it, not
    // double-append (crash-replay is exactly this call)
    val sink = new graft.sources.TxStreamSink(root, ckpt, Nil, Nil)
    sink.addBatch(0L, rows(0, 40))
    assert(TxTable.open(root).currentVersion == vBefore, "replayed batch must not commit")
    assert(TxTable.open(root).read(spark).count() == 70)
    // a genuinely NEW batchId commits
    sink.addBatch(99L, rows(70, 80))
    assert(TxTable.open(root).read(spark).count() == 80)
    // append-only contract: other output modes refuse loudly at start
    val e = intercept[Exception] {
      source.toDF().groupBy(col("value")).count()
        .writeStream.format("txtable")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_txsinkfmt_ckpt2").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start(Files.createTempDirectory("graft_txsinkfmt2").toString)
    }
    assert(e.getMessage.toLowerCase.contains("append"))
  }

  test("compaction bin-packs small files, preserves content, keeps time travel; vacuum reclaims") {
    val t = freshTable()
    // streaming-shaped ingest: 6 tiny files (one per micro-batch)
    (0 until 6).foreach { i =>
      assert(t.appendBatch(spark, rows(i * 10L, i * 10L + 10L).coalesce(1), "q", i.toLong))
    }
    val before = t.snapshot()
    assert(before.version == 6 && before.files.size == 6)
    val res = t.compact(spark, smallRows = 100)
    assert(res.version == 7)
    assert(res.rewrittenFiles == 6, "all six 10-row files are small")
    val after = t.snapshot()
    assert(after.files.size < 6, s"expected fewer files, got ${after.files.size}")
    assert(after.files.map(_.rows).sum == 60)
    // content identical through the rewrite
    val got = t.read(spark).select(col("user_id"), col("v"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == (0L until 60L).map(u => (u, u * 3)))
    // txn watermarks survive compaction (carried forward by every commit)
    assert(after.txns == Map("q" -> 5L))
    // historical snapshot still reads the pre-compaction small files
    assert(t.read(spark, versionAsOf = Some(6)).count() == 60)
    // a large file is left alone by a second compaction
    val res2 = t.compact(spark, smallRows = 100)
    assert(res2.rewrittenFiles == 0 && res2.version == 7, "nothing left to pack")

    // vacuum: retain only the latest 1 version → versions 1-6 expire and
    // the six small files (referenced by no retained manifest) die
    val dataDir = Paths.get(t.root, "data")
    val filesBefore = Option(dataDir.toFile.list()).get.count(_.endsWith(".parquet"))
    val (deleted, dropped) = t.vacuum(retainVersions = 1)
    assert(dropped == 6, s"six manifests must expire, got $dropped")
    assert(deleted == 6, s"six unreferenced files must die, got $deleted")
    val filesAfter = Option(dataDir.toFile.list()).get.count(_.endsWith(".parquet"))
    assert(filesAfter == filesBefore - 6)
    // current version unaffected; expired version now fails loudly
    assert(t.read(spark).count() == 60)
    intercept[IllegalArgumentException] { t.snapshot(Some(3)) }
    // idempotent: nothing more to reclaim
    assert(t.vacuum(retainVersions = 1) == ((0, 0)))
  }

  test("z-order rewrite makes BOTH dimensions prune files; content and history survive") {
    val t = new TxTable(
      Files.createTempDirectory("graft_txzorder").toString, Seq("x", "y"))
    // 32x32 grid ingested clustered by x only — the time-clustered-ingest
    // shape: a y-probe overlaps every file's [0,31] y-range
    val grid = spark.range(0, 1024).toDF("id")
      .select((col("id") % 32).as("x"), expr("id DIV 32").as("y"),
        (col("id") * 7).as("payload"))
    t.append(spark, grid.repartitionByRange(8, col("x")))
    val yBefore = t.readWhere(spark, "y", 0, 3)
    assert(yBefore.filesScanned == yBefore.filesTotal,
      s"x-clustered layout cannot prune a y-probe (${yBefore.filesScanned}/${yBefore.filesTotal})")
    val res = t.clusterZorder(spark, "x", "y", files = 8)
    assert(res.rewrittenFiles == 8 && res.version == 2)
    // both dimensions now prune
    val yAfter = t.readWhere(spark, "y", 0, 3)
    assert(yAfter.filesScanned < yAfter.filesTotal && yAfter.filesScanned <= 4,
      s"y-probe must prune after z-order (${yAfter.filesScanned}/${yAfter.filesTotal})")
    val xAfter = t.readWhere(spark, "x", 0, 3)
    assert(xAfter.filesScanned < xAfter.filesTotal && xAfter.filesScanned <= 4,
      s"x-probe must still prune after z-order (${xAfter.filesScanned}/${xAfter.filesTotal})")
    // pruned answers are exact, content unchanged, history intact
    val probe = yAfter.df.select(col("x"), col("y"), col("payload"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(probe == (0L until 1024L).filter(i => i / 32 <= 3)
      .map(i => (i % 32, i / 32, i * 7)).sorted)
    val all = t.read(spark).select(col("x"), col("y"), col("payload"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(all == (0L until 1024L).map(i => (i % 32, i / 32, i * 7)).sorted)
    assert(t.read(spark, versionAsOf = Some(1)).count() == 1024)
  }

  test("z-order quantizes wide-domain columns from manifest stats instead of refusing") {
    import spark.implicits._
    val t = new TxTable(Files.createTempDirectory("graft_zwide").toString,
      Seq("a", "b"))
    // a: millions-wide domain (outside [0, 2^16)); b: in-domain, spread
    // across the 16-bit space (a column squeezed into a tiny corner of
    // the domain has constant high interleave bits — nothing to split)
    t.append(spark, spark.range(0, 4000).toDF("id")
      .select((col("id") * 1000000L).as("a"),
        (col("id") % 500L * 131L).as("b"),
        col("id").as("payload"))
      .repartitionByRange(8, col("a")))
    val before = t.read(spark).collect().map(_.toSeq).toSet
    val r = t.clusterZorder(spark, "a", "b", files = 8)
    assert(r.newFiles == 8)
    assert(t.read(spark).collect().map(_.toSeq).toSet == before,
      "z-order must preserve content bit-exactly")
    // the monotone rescale keeps BOTH dimensions' file stats tight: a
    // band probe on the RAW wide column prunes files post-cluster
    val pr = t.readWhere(spark, "a", 1000000000L, 1200000000L)
    assert(pr.filesScanned < pr.filesTotal,
      s"wide-column prune must survive quantization: $pr")
    val prB = t.readWhere(spark, "b", 1000, 4000)
    assert(prB.filesScanned < prB.filesTotal,
      s"in-domain column must prune too: $prB")
  }

  test("z-order derives QUANTILE codes from manifest histograms on skewed columns") {
    import spark.implicits._
    // 90% of the mass sits in [0, 7200), a thin tail runs to 4×10⁹: the
    // uniform min/max rescale maps the ENTIRE head to code 0 (7200 /
    // (4e9/65535) < 1), so head files' intervals all span the head and a
    // head-band probe scans them all; the CDF-merged quantile codes
    // spread the head across ~90% of the code space instead
    def mk(): TxTable = {
      val t = new TxTable(Files.createTempDirectory("graft_zskew").toString,
        Seq("a", "b"))
      t.append(spark, spark.range(0, 4000).toDF("id")
        .select(when(col("id") < 3600, col("id") * 2L)
            .otherwise((col("id") - 3599L) * 10000000L).as("a"),
          (col("id") % 500L * 131L).as("b"),
          col("id").as("payload"))
        .repartitionByRange(8, col("a")))
      t
    }
    val tq = mk(); val tu = mk()
    tq.clusterZorder(spark, Seq("a", "b"), files = 8)
    tu.clusterZorder(spark, Seq("a", "b"), files = 8, quantileCodes = false)
    val contentQ = tq.read(spark).collect().map(_.toSeq).toSet
    assert(contentQ == tu.read(spark).collect().map(_.toSeq).toSet,
      "code derivation must never change content")
    // a narrow band INSIDE the skew mass: quantile layout must scan
    // STRICTLY fewer files than the uniform rescale's
    val q = tq.readWhere(spark, "a", 1000, 2000)
    val u = tu.readWhere(spark, "a", 1000, 2000)
    assert(q.filesScanned < u.filesScanned,
      s"quantile codes must beat the uniform rescale inside the skew " +
        s"mass: quantile ${q.filesScanned}/${q.filesTotal} vs " +
        s"uniform ${u.filesScanned}/${u.filesTotal}")
    // and the tail still prunes under quantile codes
    val qt = tq.readWhere(spark, "a", 3000000000L, 4000000000L)
    assert(qt.filesScanned < qt.filesTotal,
      s"tail band must still prune under quantile codes: $qt")
  }

  test("schema evolution: new columns appear without rewriting history; merge crosses schemas") {
    val t = freshTable()
    t.append(spark, rows(0, 10).coalesce(1)) // old schema: (user_id, v)
    t.append(spark, rows(10, 20).withColumn("w", col("user_id") + 1000L).coalesce(1))
    val evolved = t.read(spark)
    assert(evolved.columns.sorted.toSeq == Seq("user_id", "v", "w").sorted.toSeq)
    val got = evolved.select(col("user_id"), col("w"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    assert(got == (0L until 10L).map(u => (u, None)) ++
      (10L until 20L).map(u => (u, Some(u + 1000L))),
      "old rows read NULL in the evolved column; no file was rewritten")
    // merge with an evolved-schema source: matched rows get the new
    // column, untouched old rows keep NULL
    val src = spark.range(5, 8).toDF("user_id")
      .select(col("user_id"), (col("user_id") * 3).as("v"),
        lit(-5L).as("w"))
    t.merge(spark, src, "user_id")
    val after = t.read(spark).select(col("user_id"), col("w"))
      .as[(Long, Option[Long])].collect().toMap
    assert((5L until 8L).forall(u => after(u).contains(-5L)))
    assert((0L until 5L).forall(u => after(u).isEmpty))
    assert((10L until 20L).forall(u => after(u).contains(u + 1000L)))
  }

  test("sink-stub resolution never shadows an existing table; conf-default checkpoint resolves the sink") {
    // (round-10 ADVICE) the streaming-sink Table stub used to key on the
    // checkpointLocation OPTION alone: an existing-table batch read that
    // carried the option resolved a schema-less stub, and a writeStream
    // relying on the conf DEFAULT missed the stub and threw.
    val t = freshTable()
    t.append(spark, rows(0, 25).coalesce(1))
    // 1) batch read of an EXISTING root with a stray checkpointLocation
    //    option reads normally (the real table resolves, not the stub)
    val got = spark.read.format("txtable")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stub_ck").toString)
      .load(t.root)
    assert(got.count() == 25 && got.columns.contains("v"))
    // 2) writeStream with ONLY the session-conf default checkpoint
    //    location still resolves the sink for a first-batch-creates root
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    source.addData(0L until 30L: _*)
    val root = Files.createTempDirectory("graft_txsinkconf").toString + "/t"
    val ckBase = Files.createTempDirectory("graft_txsinkconf_ck").toString
    spark.conf.set("spark.sql.streaming.checkpointLocation", ckBase)
    try {
      val q = source.toDF().select(col("value").as("user_id"),
          (col("value") * 3).as("v"))
        .writeStream.format("txtable").queryName("conf_default_sink")
        .trigger(Trigger.AvailableNow())
        .start(root)
      assert(q.awaitTermination(120000), "stream did not finish")
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
    assert(TxTable.open(root).read(spark).count() == 30)
    // 3) batch read of a MISSING root stays a loud error
    intercept[Exception] {
      spark.read.format("txtable").load(root + "_nope").count()
    }
  }

  test("vacuum never deletes a file any retained version references") {
    val t = freshTable()
    t.append(spark, rows(0, 10).coalesce(1))   // v1: file A
    t.append(spark, rows(10, 20).coalesce(1))  // v2: A + B
    t.append(spark, rows(20, 30).coalesce(1))  // v3: A + B + C
    val (deleted, dropped) = t.vacuum(retainVersions = 2) // drop v1 only
    assert(dropped == 1)
    assert(deleted == 0, "v1's file is still referenced by v2 and v3")
    assert(t.read(spark, versionAsOf = Some(2)).count() == 20)
    assert(t.read(spark).count() == 30)
  }

  test("mergeBatch: exactly-once streaming UPSERT — replay skipped, keys converge to the latest batch") {
    val t = freshTable()
    def batch(lo: Long, hi: Long, tag: Long) =
      spark.range(lo, hi).toDF("user_id").withColumn("v", col("user_id") * 10 + tag)
    // batch 0 bootstraps the empty table via append
    assert(t.mergeBatch(spark, batch(0, 50, 0), "up_q", 0L, "user_id"))
    // batch 1 overlaps [30, 50) and extends to 70 — overlapped keys must
    // take batch 1's values, the rest carry
    assert(t.mergeBatch(spark, batch(30, 70, 1), "up_q", 1L, "user_id"))
    // crash replay of batch 1: recognized from the manifest, no-op
    assert(!t.mergeBatch(spark, batch(30, 70, 1), "up_q", 1L, "user_id"))
    val got = t.read(spark).select(col("user_id"), col("v"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 70, s"upsert must not duplicate keys: ${got.size}")
    assert((0L until 30L).forall(u => got(u) == u * 10))
    assert((30L until 70L).forall(u => got(u) == u * 10 + 1),
      "overlapped keys must converge to the LATEST batch")
    // the watermark rode the merge commit itself
    assert(t.snapshot().txns == Map("up_q" -> 1L))
  }

  test("mergeBatch mor=true: exactly-once MoR upsert — zero rewrites, replay skipped, CoW-identical") {
    import spark.implicits._
    val cow = freshTable(); val mor = freshTable()
    Seq(cow, mor).foreach(_.appendBatch(spark, rows(0, 50), "q", 0L))
    val b1 = rows(20, 60).withColumn("v", col("user_id") * 100L)
    assert(cow.mergeBatch(spark, b1, "q", 1L, "user_id"))
    assert(mor.mergeBatch(spark, b1, "q", 1L, "user_id", mor = true))
    assert(cow.read(spark).collect().map(_.toSeq).toSet ==
      mor.read(spark).collect().map(_.toSeq).toSet,
      "CoW and MoR streaming upserts must agree row-for-row")
    // the MoR batch landed as tombstones + appends: base files carried
    val mSnap = mor.snapshot()
    assert(mSnap.files.exists(_.dv.isDefined),
      "matched base rows must be tombstoned, not rewritten")
    // replayed batch: recognized from the watermark, nothing moves
    val v = mor.currentVersion
    assert(!mor.mergeBatch(spark, b1, "q", 1L, "user_id", mor = true))
    assert(mor.currentVersion == v)
    // the format-string face validates mergeMode loudly
    val e = intercept[IllegalArgumentException] {
      new graft.sources.TxBatchSource().createSink(
        spark.sqlContext,
        Map("path" -> mor.root, "appId" -> "q2", "mergeKey" -> "user_id",
          "mergeMode" -> "sideways"),
        Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(e.getMessage.contains("mergeMode"), e.getMessage)
  }

  test("group-atomic streaming upsert: a crash between member merges never tears a group read") {
    import org.apache.spark.sql.DataFrame
    val g = new graft.tables.TxGroup(
      Files.createTempDirectory("graft_gmerge").toString)
    val members = Seq[(String, String, DataFrame => DataFrame)](
      ("fact", "user_id", b => b),
      ("idx", "user_id",
        (b: DataFrame) => b.select(col("user_id"), (col("v") % 10).as("bucket"))))
    def deliver(batch: DataFrame, id: Long): Unit =
      StreamOps.txGroupMergeBatch(g, members, "q")(batch, id)
    // the whole-cut invariant: at EVERY group version, fact and idx
    // carry the same key set — the thing per-table exactly-once alone
    // cannot give
    def cutConsistent(v: Int): Unit = {
      val f = g.read(spark, "fact", Seq("user_id"), Some(v))
        .select(col("user_id")).collect().map(_.getLong(0)).toSet
      val ix = g.read(spark, "idx", Seq("user_id"), Some(v))
        .select(col("user_id")).collect().map(_.getLong(0)).toSet
      assert(f == ix, s"torn cut at group version $v: fact=$f idx=$ix")
    }
    deliver(rows(0, 10), 0L) // batch 0 bootstraps both members
    assert(g.currentVersion == 1)
    cutConsistent(1)
    // CRASH WINDOW: batch 1 lands on the fact member ONLY — the partial
    // write a crash between member merges leaves behind
    val b1 = rows(5, 15).withColumn("v", col("user_id") * 1000L)
    g.table("fact", Seq("user_id")).mergeBatch(spark, b1, "q/fact", 1L, "user_id")
    assert(g.currentVersion == 1, "no group publish: the cut must not move")
    cutConsistent(1) // group readers still see the whole OLD cut
    // redelivery: fact recognizes its watermark and skips, idx applies,
    // ONE group publish makes the batch visible on both members together
    deliver(b1, 1L)
    assert(g.currentVersion == 2)
    cutConsistent(2)
    val factV5 = g.read(spark, "fact", Seq("user_id"), Some(2))
      .filter(col("user_id") === 5L).head().getAs[Long]("v")
    assert(factV5 == 5000L, "overlapping keys must converge to the latest batch")
    // full redelivery AFTER publish: recognized everywhere, nothing moves
    val before = (g.currentVersion,
      g.table("fact", Seq("user_id")).currentVersion,
      g.table("idx", Seq("user_id")).currentVersion)
    deliver(b1, 1L)
    val after = (g.currentVersion,
      g.table("fact", Seq("user_id")).currentVersion,
      g.table("idx", Seq("user_id")).currentVersion)
    assert(before == after, s"replayed batch must be a no-op: $before -> $after")
    (1 to g.currentVersion).foreach(cutConsistent)
  }

  test("continuous aggregate mview: refresh rides the SAME group cut; crash replays converge") {
    // r14 verdict #7: an upsert micro-batch refreshes a dependent
    // aggregate mview and the group cut pins base AND view together —
    // a group reader can never see one without the other. Both crash
    // windows replay to convergence: member-merged-only (A) and
    // member-merged-plus-refreshed-but-unpublished (B).
    import org.apache.spark.sql.DataFrame
    Tables.ensure(spark)
    val g = new graft.tables.TxGroup(
      Files.createTempDirectory("graft_gmv").toString)
    val members = Seq[(String, String, DataFrame => DataFrame)](
      ("ev", "user_id", b => b.withColumn("g", expr("v % 4"))))
    def deliver(mvs: Seq[String])(batch: DataFrame, id: Long): Unit =
      StreamOps.txGroupMergeMviewBatch(g, members, mvs, "q")(batch, id)
    deliver(Nil)(rows(0, 10), 0L) // bootstrap the member before the view
    val evRoot = s"${g.root}/tables/ev"
    val mvRoot = s"${g.root}/tables/mv"
    spark.sql(s"CREATE MATERIALIZED VIEW txtable.`$mvRoot` " +
      "TBLPROPERTIES('statCols'='g') AS " +
      s"SELECT g, count(*) AS n, sum(v) AS sv FROM txtable.`$evRoot` GROUP BY g")
    def viewEqualsRecompute(groupV: Int): Unit = {
      val cut = g.snapshot(Some(groupV))
      val got = graft.tables.TxTable.open(mvRoot).read(spark, cut.get("mv"))
        .select(col("g"), col("n"), col("sv")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = graft.tables.TxTable.open(evRoot).read(spark, cut.get("ev"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"view diverged from its base at group cut $groupV")
    }
    deliver(Seq("mv"))(rows(5, 20), 1L)
    val v1 = g.currentVersion
    assert(g.snapshot().contains("mv"), "the cut must pin the view")
    viewEqualsRecompute(v1)
    // CRASH A: member merged, refresh and publish never ran — replay
    val b2 = rows(15, 30).withColumn("v", col("user_id") * 7)
    g.table("ev", Seq("user_id"))
      .mergeBatch(spark, members.head._3(b2), "q/ev", 2L, "user_id")
    assert(g.currentVersion == v1, "a torn batch must stay invisible")
    deliver(Seq("mv"))(b2, 2L)
    val v2 = g.currentVersion
    assert(v2 == v1 + 1)
    viewEqualsRecompute(v2)
    // CRASH B: member merged AND view refreshed, publish never ran
    val b3 = rows(0, 5).withColumn("v", col("user_id") * 11)
    g.table("ev", Seq("user_id"))
      .mergeBatch(spark, members.head._3(b3), "q/ev", 3L, "user_id")
    spark.sql(s"REFRESH MATERIALIZED VIEW txtable.`$mvRoot`")
    assert(g.currentVersion == v2, "a torn batch must stay invisible")
    deliver(Seq("mv"))(b3, 3L)
    val v3 = g.currentVersion
    assert(v3 == v2 + 1)
    viewEqualsRecompute(v3)
    // full replay after publish: recognized everywhere, nothing moves
    def state() = (g.currentVersion,
      graft.tables.TxTable.open(evRoot).currentVersion,
      graft.tables.TxTable.open(mvRoot).currentVersion)
    val before = state()
    deliver(Seq("mv"))(b3, 3L)
    assert(state() == before, s"replayed batch must be a no-op: $before -> ${state()}")
    // every retained historical cut stays view-consistent
    (v1 to v3).foreach(viewEqualsRecompute)
  }

  test("format(\"txtable\") with option(\"mergeKey\") streams an upsert end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    val root = Files.createTempDirectory("graft_txsinkup").toString
    val ckpt = Files.createTempDirectory("graft_txsinkup_ckpt").toString
    val q = source.toDF().select(col("value").as("user_id"),
        (col("value") * 3).as("v"))
      .writeStream.format("txtable")
      .option("checkpointLocation", ckpt)
      .option("statCols", "user_id")
      .option("mergeKey", "user_id")
      .start(root)
    // two SEPARATE micro-batches (AvailableNow would fold both adds into
    // one batch and the overlap would bootstrap-append): batch 0 = keys
    // [0, 40), batch 1 overlaps [20, 50)
    source.addData(0L until 40L: _*)
    q.processAllAvailable()
    source.addData(20L until 50L: _*)
    q.processAllAvailable()
    q.stop()
    val t = TxTable.open(root)
    // overlap [20, 40) merged, never appended: 50 distinct keys
    assert(t.read(spark).count() == 50,
      "the upsert sink must converge overlapping keys, not append them")
    assert(t.read(spark).agg(sum(col("v"))).head().getLong(0) ==
      (0L until 50L).map(_ * 3).sum)
  }

  test("option(\"mergeKey\", \"a,b\") streams a COMPOSITE-key upsert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    val root = Files.createTempDirectory("graft_txsinkmk").toString
    val ckpt = Files.createTempDirectory("graft_txsinkmk_ckpt").toString
    // key = (u, d): u = value % 20, d = (value / 20) % 4, payload v = value
    val q = source.toDF().select((col("value") % 20).as("u"),
        expr("(value div 20) % 4").as("d"), col("value").as("v"))
      .writeStream.format("txtable")
      .option("checkpointLocation", ckpt)
      .option("statCols", "u")
      .option("mergeKey", "u, d")
      .start(root)
    source.addData(0L until 40L: _*)   // batch 0: 40 distinct (u, d 0/1)
    q.processAllAvailable()
    // batch 1: values 100..109 re-key (u 0..9, d=1) with v = 100+u;
    // values 40..44 mint NEW pairs (u 0..4, d=2)
    source.addData((100L until 110L) ++ (40L until 45L): _*)
    q.processAllAvailable()
    q.stop()
    val t = TxTable.open(root)
    val got = t.read(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 45, s"40 + 5 new (u, d) pairs, got ${got.size}")
    // (u, 1) replaced via BOTH key components — (u, 0) rows share u and
    // must be untouched
    assert((0L until 10L).forall(u => got((u, 1L)) == u + 100L),
      s"overlapping composite keys must merge: $got")
    assert((0L until 10L).forall(u => got((u, 0L)) == u),
      "same-u rows on another day must never be touched")
  }
}
