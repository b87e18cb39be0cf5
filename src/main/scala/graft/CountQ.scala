package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time `.count()` of named queries at a scale-factor dir —
  * `runMain graft.CountQ /root/testdata/sf0.1 q_dedup_minhash ...`.
  * Set EXPLAIN=1 to dump the executed plan first. Complements Bench
  * (full suite) when iterating on one operator. */
object CountQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { n =>
      // time construction + count together, like Bench: iterative queries
      // (CC, SSSP, LPA) run jobs eagerly during construction, so a
      // count-only timer would read near-zero for them
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("EXPLAIN")) println(df.queryExecution.executedPlan.toString.take(6000))
      val c = df.count()
      println(f"COUNT $n = $c (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
