package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the executed plan of a named query after running it. */
object PlanDumpQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(sys.env.getOrElse("PLAN_CHARS", "4000").toInt))
    spark.stop()
  }
}
