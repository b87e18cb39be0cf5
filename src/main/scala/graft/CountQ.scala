package graft
import org.apache.spark.sql.SparkSession
object CountQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"==== $n")
      println(plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("Join") ||
        l.contains("TakeOrdered") || l.contains("ReadSchema") || l.contains("WholeStageCodegen") ||
        l.contains("HashAggregate")).take(8).mkString("\n"))
    }
    spark.stop()
  }
}
