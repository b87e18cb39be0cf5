package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.Tables

/** Dev-only profiling main: per-statement wall time + Spark job count for
  * the join-mview gate (not part of any driver surface). */
object ProfMview {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val verbose = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(je.jobId)
        if (verbose.get && t0 != 0L)
          println(f"   job ${je.jobId}: ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    // warm pass (same discipline as the bench)
    t("WARM q_sql_table_mview_join")(SqlTableOps.q_sql_table_mview_join(spark, dir).count())
    t("WARM2 q_sql_table_mview_join")(SqlTableOps.q_sql_table_mview_join(spark, dir).count())
    // now statement-by-statement
    val root = java.nio.file.Files.createTempDirectory("prof_mvj").toString
    t("copyTree")(TableOps.copyTree(published, root))
    val work = java.nio.file.Files.createTempDirectory("prof_mvj_v")
    val dim = s"$work/dim"
    val mv = s"$work/mvj"
    t("create dim CTAS")(spark.sql(s"CREATE TABLE ${q(dim)} " +
      "TBLPROPERTIES('statCols'='user_id') AS " +
      "SELECT user_id, user_id % 5 AS seg " +
      s"FROM (SELECT DISTINCT user_id FROM ${q(root)})"))
    t("create mview")(spark.sql(s"CREATE MATERIALIZED VIEW ${q(mv)} " +
      "TBLPROPERTIES('statCols'='seg') AS " +
      "SELECT d.seg AS seg, count(*) AS n, " +
      "sum(CAST(f.value AS DECIMAL(18,2))) AS v_sum " +
      s"FROM ${q(root)} f JOIN ${q(dim)} d ON f.user_id = d.user_id " +
      "WHERE f.user_id <= 9000001 GROUP BY d.seg"))
    t("insert fact")(spark.sql(s"INSERT INTO ${q(root)} VALUES " +
      "(CAST(4 AS BIGINT), 'zz-new', CAST(1.5 AS DOUBLE)), " +
      "(CAST(9000001 AS BIGINT), 'zz-new', CAST(2.5 AS DOUBLE))"))
    t("delete fact band")(spark.sql(s"DELETE FROM ${q(root)} WHERE user_id BETWEEN 0 AND 2"))
    t("delete dim member")(spark.sql(s"DELETE FROM ${q(dim)} WHERE user_id = 5"))
    t("insert dim")(spark.sql(s"INSERT INTO ${q(dim)} VALUES " +
      "(CAST(9000001 AS BIGINT), CAST(1 AS BIGINT))"))
    verbose.set(true)
    t("REFRESH")(spark.sql(s"REFRESH MATERIALIZED VIEW ${q(mv)}").head())
    verbose.set(false)
    t("readback")(spark.sql(
      s"SELECT seg, CAST(n AS BIGINT) AS n, CAST(v_sum AS DOUBLE) AS v_sum " +
      s"FROM ${q(mv)} ORDER BY seg").collect())
    t("drop")(spark.sql(s"DROP MATERIALIZED VIEW ${q(mv)}"))
    TableOps.deleteTree(work.toString)
    TableOps.deleteTree(root)
    spark.stop()
  }
}
