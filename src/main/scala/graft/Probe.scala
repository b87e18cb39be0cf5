package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only probe main: scratch timings/plans for whatever is currently
  * under investigation (not part of any driver surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    t("docs-scan")(docs.select(col("doc_id"), col("text")).count())
    def trigrams(c: String) =
      s"array_distinct(transform(sequence(1, length($c) - 2), i -> substring($c, i, 3)))"
    t("gram-array-size-sum") {
      docs.filter(length(col("text")) >= 3)
        .select(size(expr(trigrams("text"))).as("n")).agg(sum(col("n"))).head()
    }
    val pats = Seq("fast merge", "table key", "vector scan")
    val needed = array(pats.flatMap(_.sliding(3)).distinct.map(lit): _*)
    t("intersect-explode-count") {
      docs.filter(length(col("text")) >= 3)
        .select(col("doc_id"),
          explode(array_intersect(expr(trigrams("text")), needed)).as("gram"))
        .count()
    }
    t("full-query")(queries.Analytics7.q_like_trgm(spark, dir).count())
    t("full-query-2nd")(queries.Analytics7.q_like_trgm(spark, dir).count())
    spark.stop()
  }
}
