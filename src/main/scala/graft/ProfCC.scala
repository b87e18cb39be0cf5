package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only profiler for the connected-components loop. */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 1000)
    val sets = docs.select(col("doc_id"),
      expr("array_sort(transform(array_distinct(split(text, ' ')), w -> xxhash64(w)))").as("ws"))
    val pairs = graft.operators.SetSimilarity.exactJaccardPairs(sets, minBp = 8000L)
      .select(col("da"), col("db")).persist()
    val ne = t("pairs-materialize")(pairs.count())
    println(s"edges=$ne")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val out = graft.operators.ConnectedComponents
        .minLabel(docs.select(col("doc_id")), "doc_id", pairs, "da", "db")
      val n = out.count()
      println(f"PROF cc-loop+count run$i%d: ${(System.nanoTime()-t0)/1e9}%.2f s (rows=$n%d)")
    }
    spark.stop()
  }
}
