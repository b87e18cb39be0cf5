package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.Tables

/** Dev-only profiling main: per-statement wall time + Spark job count for
  * the chain/join3 mview gates (not part of any driver surface). */
object ProfMview2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = new java.util.concurrent.atomic.AtomicBoolean(false)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime())
        if (verbose.get) {
          val site = js.stageInfos.lastOption.map(_.details.linesIterator
            .filterNot(_.contains("org.apache.spark"))
            .take(2).mkString(" <- ")).getOrElse("?")
          println(s"   job ${js.jobId} START ${js.stageInfos.lastOption.map(_.name).getOrElse("?")} | $site")
        }
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(je.jobId)
        if (verbose.get && t0 != 0L)
          println(f"   job ${je.jobId} END ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    })
    def t[A](what: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $what: $dt%.3f s, jobs=${jobs.get() - j0}")
      r
    }
    def q(p: String) = s"txtable.`$p`"
    Tables.ensure(spark)
    val published = TableOps.eventsTableRoot(spark, dir)
    t("WARM chain")(SqlTableOps.q_sql_table_mview_chain(spark, dir).count())
    t("WARM2 chain")(SqlTableOps.q_sql_table_mview_chain(spark, dir).count())
    t("WARM join3")(SqlTableOps.q_sql_table_mview_join3(spark, dir).count())
    t("WARM2 join3")(SqlTableOps.q_sql_table_mview_join3(spark, dir).count())
    t("WARM minmax")(SqlTableOps.q_sql_table_mview_minmax(spark, dir).count())
    t("WARM avg")(SqlTableOps.q_sql_table_mview_avg(spark, dir).count())
    t("WARM agg")(SqlTableOps.q_sql_table_mview_agg(spark, dir).count())
    // chain, statement by statement
    val root = java.nio.file.Files.createTempDirectory("prof_mvc").toString
    t("copyTree")(TableOps.copyTree(published, root))
    val work = java.nio.file.Files.createTempDirectory("prof_mvc_v")
    val parent = s"$work/mvp"
    val child = s"$work/mvc"
    t("create parent mview")(spark.sql(s"CREATE MATERIALIZED VIEW ${q(parent)} " +
      "TBLPROPERTIES('statCols'='user_id') AS " +
      "SELECT user_id, event_type, count(*) AS n, " +
      "sum(CAST(value AS DECIMAL(18,2))) AS v_sum " +
      s"FROM ${q(root)} WHERE user_id <= 20 GROUP BY user_id, event_type"))
    t("create child mview")(spark.sql(s"CREATE MATERIALIZED VIEW ${q(child)} " +
      "TBLPROPERTIES('statCols'='user_id') AS " +
      "SELECT user_id, count(*) AS n_types, sum(n) AS n_total, " +
      "sum(v_sum) AS v_total " +
      s"FROM ${q(parent)} GROUP BY user_id"))
    t("insert src")(spark.sql(s"INSERT INTO ${q(root)} VALUES " +
      "(CAST(4 AS BIGINT), 'zz-new', CAST(1.5 AS DOUBLE)), " +
      "(CAST(9000001 AS BIGINT), 'zz-new', CAST(2.5 AS DOUBLE))"))
    t("delete src band")(spark.sql(s"DELETE FROM ${q(root)} WHERE user_id BETWEEN 0 AND 2"))
    verbose.set(true)
    t("refresh parent")(spark.sql(s"REFRESH MATERIALIZED VIEW ${q(parent)}").head())
    verbose.set(false)
    t("refresh child")(spark.sql(s"REFRESH MATERIALIZED VIEW ${q(child)}").head())
    t("readback")(spark.sql(
      s"SELECT user_id FROM ${q(child)} ORDER BY user_id").collect())
    t("drop both") {
      spark.sql(s"DROP MATERIALIZED VIEW ${q(child)}")
      spark.sql(s"DROP MATERIALIZED VIEW ${q(parent)}")
    }
    TableOps.deleteTree(work.toString)
    TableOps.deleteTree(root)
    spark.stop()
  }
}
