package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print a registered query's formatted physical plan
  * (post-AQE where applicable) without running the bench harness.
  *
  *   sbt "runMain graft.Explain q_text_bm25 /root/testdata/sf0.01"
  *
  * Prints the formatted plan, executes the query once, then prints the
  * FINAL adaptive plan (what actually ran) — the two differ exactly by
  * AQE's runtime decisions (broadcast conversions, partition coalescing),
  * which is usually the thing being checked.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.Explain <query_name> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, sfDir)
    println(s"=== $name: static plan ===")
    df.explain("formatted")
    val t0 = System.nanoTime()
    // collect() (not count()) so THIS df's QueryExecution runs and AQE
    // finalizes — count() executes a derived pruned plan and would leave
    // executedPlan an unfinalized AdaptiveSparkPlan (isFinalPlan=false)
    val n = df.collect().length
    println(f"=== $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s; final adaptive plan ===")
    println(df.queryExecution.executedPlan.toString.take(20000))
    spark.stop()
  }
}
