package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer statistics actually driving a plan choice — the
  * static sibling of the AQE runtime re-plans asserted elsewhere: a dim
  * table whose RAW size exceeds the broadcast threshold but whose
  * FILTERED cardinality is tiny plans a SortMergeJoin when the optimizer
  * only knows bytes, and flips to a static BroadcastHashJoin once
  * `ANALYZE TABLE ... FOR COLUMNS` gives CBO the ndv to estimate the
  * equality filter's selectivity. On a cluster this is the difference
  * between shuffling the fact table and not — and it is stats hygiene
  * (ANALYZE after load), not query changes, that buys it. AQE is
  * disabled inside the test so the decision is provably the static
  * estimator's; runtime re-planning would eventually make the same call
  * from observed sizes. */
class CboSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("ANALYZE column stats flip the filtered-dim join from SMJ to static BHJ") {
    val loc = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    // dim: 5,000 rows, 100 distinct keys, a padding column so raw bytes
    // exceed the broadcast threshold; fact: lineitem-shaped keys
    spark.range(0, 5000).toDF("id")
      .select((col("id") % 100L).as("key"),
        concat_ws("", (1 to 8).map(_ => md5(col("id").cast("string"))): _*).as("pad"))
      .write.option("path", s"$loc/dim").saveAsTable("cbo_dim")
    spark.range(0, 20000).toDF("fid")
      .select(col("fid"), (col("fid") % 100L).as("key"))
      .write.option("path", s"$loc/fact").saveAsTable("cbo_fact")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")

    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def plan(): String = spark.sql(
        """SELECT f.fid, d.pad FROM cbo_fact f
          |JOIN cbo_dim d ON f.key = d.key WHERE d.key = 7""".stripMargin)
        .queryExecution.executedPlan.toString

      // table-level stats only: the filter's output is estimated at full
      // size (no ndv -> no selectivity), dim stays over the threshold
      val before = plan()
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected SMJ without column stats:\n$before")

      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS key")
      val after = plan()
      assert(after.contains("BroadcastHashJoin"),
        s"column stats did not flip the join to broadcast:\n$after")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
    }
  }

  test("txtable manifest stats drive multi-join reorder with NO ANALYZE pass") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    Tables.ensure(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_cbo_tx").toString
    def mk(name: String, df: org.apache.spark.sql.DataFrame,
        statCols: Seq[String]): String = {
      val t = new graft.tables.TxTable(s"$tmp/$name", statCols)
      t.append(spark, df)
      t.root
    }
    // same shape as the catalog-table reorder test below, but the row
    // counts, column bounds, and the min(rows, max-min+1) ndv estimate
    // all come from O(files) MANIFEST metadata (TxV1Scan.columnStats via
    // the stats-forwarding rewrap + the post-pushdown CostBasedJoinReorder
    // pass) — at 100 TB there is no ANALYZE to run
    val fact = mk("fact", spark.range(0, 100000).toDF("fid")
      .select(col("fid"), (col("fid") % 1000L).as("ka"),
        (col("fid") % 1000L).as("kb")), Seq("ka", "kb"))
    val big = mk("big", spark.range(0, 20000).toDF("id")
      .select((col("id") % 1000L).as("ka"),
        md5(col("id").cast("string")).as("pa")), Seq("ka"))
    val small = mk("small", spark.range(0, 10).toDF("id")
      .select(col("id").as("kb"), md5(col("id").cast("string")).as("pb")),
      Seq("kb"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false", // the decision must be static
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def innermost(reorder: Boolean): String = {
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", reorder.toString)
        val q = spark.sql(
          s"""SELECT f.fid, a.pa, b.pb FROM txtable.`$fact` f
             |JOIN txtable.`$big` a ON f.ka = a.ka
             |JOIN txtable.`$small` b ON f.kb = b.kb""".stripMargin)
        q.queryExecution.optimizedPlan.collect {
          case j: Join if !j.children.exists(_.exists(_.isInstanceOf[Join])) =>
            j.toString
        }.head
      }
      val asWritten = innermost(reorder = false)
      assert(asWritten.contains(big) && !asWritten.contains(small),
        s"without reorder the written (pessimal) order must stand:\n$asWritten")
      val reordered = innermost(reorder = true)
      assert(reordered.contains(small) && !reordered.contains(big),
        s"manifest stats did not move the selective dim innermost:\n$reordered")
    } finally {
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("ANALYZE row counts drive multi-join reorder: the selective dim joins first") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val loc = java.nio.file.Files.createTempDirectory("graft_cbo_reorder").toString
    Seq("cbo_fact2", "cbo_big", "cbo_small")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // fact: 100k rows with two FKs; big dim: 20k rows on ka; small dim:
    // 10 rows on kb. The query's WRITTEN order joins big FIRST — the
    // pessimal left-deep tree (fact⋈big ≈ 2M intermediate rows vs
    // fact⋈small ≈ 1k). Only statistics can justify the swap.
    spark.range(0, 100000).toDF("fid")
      .select(col("fid"), (col("fid") % 1000L).as("ka"), (col("fid") % 1000L).as("kb"))
      .write.option("path", s"$loc/fact2").saveAsTable("cbo_fact2")
    spark.range(0, 20000).toDF("id")
      .select((col("id") % 1000L).as("ka"), md5(col("id").cast("string")).as("pa"))
      .write.option("path", s"$loc/big").saveAsTable("cbo_big")
    spark.range(0, 10).toDF("id")
      .select(col("id").as("kb"), md5(col("id").cast("string")).as("pb"))
      .write.option("path", s"$loc/small").saveAsTable("cbo_small")
    Seq("cbo_fact2", "cbo_big", "cbo_small").foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
    }
    spark.sql("ANALYZE TABLE cbo_fact2 COMPUTE STATISTICS FOR COLUMNS ka, kb")
    spark.sql("ANALYZE TABLE cbo_big COMPUTE STATISTICS FOR COLUMNS ka")
    spark.sql("ANALYZE TABLE cbo_small COMPUTE STATISTICS FOR COLUMNS kb")

    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false", // decision must be static CBO's
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // no BHJ shortcut: order is all that differs
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the innermost Join (no Join children) is the first executed pair
      def innermost(reorder: Boolean): String = {
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", reorder.toString)
        val q = spark.sql(
          """SELECT f.fid, a.pa, b.pb FROM cbo_fact2 f
            |JOIN cbo_big a ON f.ka = a.ka
            |JOIN cbo_small b ON f.kb = b.kb""".stripMargin)
        q.queryExecution.optimizedPlan.collect {
          case j: Join if !j.children.exists(_.exists(_.isInstanceOf[Join])) => j.toString
        }.head
      }
      val asWritten = innermost(reorder = false)
      assert(asWritten.contains("cbo_big") && !asWritten.contains("cbo_small"),
        s"without reorder the written (pessimal) order must stand:\n$asWritten")
      val reordered = innermost(reorder = true)
      assert(reordered.contains("cbo_small") && !reordered.contains("cbo_big"),
        s"stats did not move the selective dim into the innermost join:\n$reordered")
    } finally {
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      Seq("cbo_fact2", "cbo_big", "cbo_small")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("manifest equi-depth histograms expose skew: the range-filtered join flips SMJ to BHJ") {
    import java.nio.file.{Files, Paths}
    Tables.ensure(spark)
    val tmp = Files.createTempDirectory("graft_cbo_hist").toString
    // dim: 99% of rows carry ONE key in the middle of a wide domain —
    // min/max+ndv say "uniform over [0, 980000]" (the skew lie), the
    // manifest's 8-bucket equi-depth bounds say where the mass SITS
    val dim = new graft.tables.TxTable(s"$tmp/dim", Seq("key"))
    dim.append(spark, spark.range(0, 5000).toDF("id")
      .select(when(col("id") < 50, col("id") * 20000L)
          .otherwise(500000L).as("key"),
        md5(col("id").cast("string")).as("pad")))
    val fact = new graft.tables.TxTable(s"$tmp/fact", Seq("key"))
    fact.append(spark, spark.range(0, 20000).toDF("fid")
      .select(col("fid"), (col("fid") % 50L * 20000L).as("key")))
    // LEGACY twin: byte-identical data, `hist:` tokens stripped from the
    // manifest — exactly what a pre-histogram writer left behind; also
    // pins that old manifests keep parsing and estimation degrades to
    // the min/max uniform assumption instead of erroring
    val legacy = s"$tmp/dim0"
    def copyTree(src: String, dst: String): Unit = {
      val s = Paths.get(src)
      val walk = Files.walk(s)
      try walk.forEach { p =>
        val t = Paths.get(dst).resolve(s.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
        ()
      } finally walk.close()
    }
    copyTree(s"$tmp/dim", legacy)
    val logDir = Paths.get(legacy, "_txlog")
    val logs = Files.list(logDir).iterator()
    while (logs.hasNext) {
      val p = logs.next()
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      Files.write(p, txt.replaceAll("hist:[^\\t]*\\t", "").getBytes("UTF-8"))
    }
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false", // the decision must be static
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "8192")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def plan(dimRoot: String): String = spark.sql(
        s"""SELECT f.fid, d.pad FROM txtable.`${fact.root}` f
           |JOIN txtable.`$dimRoot` d ON f.key = d.key
           |WHERE d.key >= 900000""".stripMargin)
        .queryExecution.executedPlan.toString
      // uniform assumption: ~8% of 5000 rows ⇒ over the 8 KB threshold
      val before = plan(legacy)
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"without histograms the skewed dim must plan SMJ:\n$before")
      // histogram: the tail band holds ~2% of the mass ⇒ broadcastable
      val after = plan(dim.root)
      assert(after.contains("BroadcastHashJoin"),
        s"manifest histograms did not flip the skewed range join to BHJ:\n$after")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("ANALYZE TABLE txtable FOR COLUMNS lights up ndv estimates on a table created WITHOUT statCols") {
    Tables.ensure(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_cbo_analyze").toString
    // NO statCols at create time: the manifest records row counts but no
    // column intervals, so the filtered-dim join has no ndv to estimate
    // `d.key = 7`'s selectivity and plans SMJ — the stats-hygiene gap
    // ANALYZE exists to close (the txtable twin of the catalog-table
    // flip test above, with evolveStats instead of a Hive metastore).
    val dim = new graft.tables.TxTable(s"$tmp/dim", Nil)
    dim.append(spark, spark.range(0, 5000).toDF("id")
      .select((col("id") % 100L).as("key"),
        concat_ws("", (1 to 8).map(_ => md5(col("id").cast("string"))): _*).as("pad")))
    val fact = new graft.tables.TxTable(s"$tmp/fact", Nil)
    fact.append(spark, spark.range(0, 20000).toDF("fid")
      .select(col("fid"), (col("fid") % 100L).as("key")))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def plan(): String = spark.sql(
        s"""SELECT f.fid, d.pad FROM txtable.`${fact.root}` f
           |JOIN txtable.`${dim.root}` d ON f.key = d.key
           |WHERE d.key = 7""".stripMargin)
        .queryExecution.executedPlan.toString
      val before = plan()
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"without column stats the filtered dim must not broadcast:\n$before")
      val vBefore = dim.currentVersion
      spark.sql(s"ANALYZE TABLE txtable.`${dim.root}` COMPUTE STATISTICS FOR COLUMNS key")
      // stats pass + widened declaration land as ONE commit, one audit row
      assert(graft.tables.TxTable.open(dim.root).currentVersion == vBefore + 1,
        "ANALYZE must publish exactly one version")
      assert(graft.tables.TxTable.open(dim.root).history().head.operation == "analyze")
      val after = plan()
      assert(after.contains("BroadcastHashJoin"),
        s"ANALYZE'd manifest ndv did not flip the join to broadcast:\n$after")
      // the statement also DECLARED the stat set: a later append through
      // open() keeps recording intervals for the analyzed column
      graft.tables.TxTable.open(dim.root).append(spark,
        spark.range(5000, 5002).toDF("id")
          .select((col("id") % 100L).as("key"),
            md5(col("id").cast("string")).as("pad")))
      val s = graft.tables.TxTable.open(dim.root).snapshot()
      assert(s.files.forall(_.mins.contains("key")),
        "post-ANALYZE appends must keep computing the declared stats")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }
}
