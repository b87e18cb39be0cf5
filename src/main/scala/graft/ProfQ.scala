package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only generic query profiler: runs named queries twice (warm +
  * timed) under bench-like session settings, reporting wall seconds,
  * job count, and summed job-execution seconds — the gap between wall
  * and job time is driver-side planning (not part of any driver
  * surface).
  *
  *   sbt "runMain graft.ProfQ q_rec_itemcf q_table_cdf"
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.ProfQ <query> [query...]")
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
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(je.jobId)
        if (t0 != 0L) { jobNanos.addAndGet(System.nanoTime() - t0); () }
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      (1 to 3).foreach { i =>
        // bench-style inter-run cleanup so runs are comparable
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val j0 = jobs.get(); val n0 = jobNanos.get(); val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val jn = (jobNanos.get() - n0) / 1e9
        println(f"== $name run$i: wall=$wall%.3f s jobs=${jobs.get() - j0} jobtime=$jn%.3f s driver-gap=${wall - jn}%.3f s")
      }
    }
    spark.stop()
  }
}
