package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: print one query's full result as TSV for ad-hoc diffing
  * against DuckDB while iterating (`runMain graft.DumpQ <sfDir> <q>...`). */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { n =>
      println(s"== $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.columns.mkString("\t"))
      df.collect().foreach(r => println(r.toSeq.mkString("\t")))
    }
    spark.stop()
  }
}
