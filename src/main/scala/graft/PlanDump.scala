package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-quality review
  * (pushdown, pruning, join strategy, codegen spans — SURVEY §4). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter_pred", "q_scan_project", "q_part_prune", "q_join_inner", "q_join_broadcast",
        "q_agg_hash", "q_sim_jaccard", "q_knn_cosine", "q_ann_ivf", "q_win_lag",
        "q_stream_tumble")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      println(s"\n######## $n ########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
