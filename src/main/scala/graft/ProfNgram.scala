package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only profiler for q_ngram_jaccard's stages. */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("warm-entry")(SparkEntry.entry(spark).count())
    for (i <- 1 to 3) {
      val sets = Tables.documents(spark, sfDir)
        .select(col("doc_id"), expr("char_ngram_hashes(text, 3)").as("ws"))
      t(s"run$i gram-hash-only") {
        sets.select(sum(expr("size(ws)"))).head()
      }
      val distinctSets = sets
        .groupBy(col("ws")).agg(collect_list(col("doc_id")).as("members"))
        .select(xxhash64(col("ws")).as("sk"), size(col("ws")).as("n"))
      t(s"run$i distinct-collapse") { distinctSets.count() }
      t(s"run$i full-query") {
        graft.queries.LlmExt.q_ngram_jaccard(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
