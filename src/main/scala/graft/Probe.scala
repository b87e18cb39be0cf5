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
    val merges = t("bpeTrain+collect") {
      queries.Analytics6.bpeTrain(spark,
          Tables.documents(spark, dir).select(col("text")), 12)
        .select(col("x"), col("y"), col("merged")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    }
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " "))
        .as("w")).filter(length(col("w")) > 0)
    val charSyms = concat(
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
      array(lit("</w>")))
    val encoded = merges.foldLeft(charSyms) { case (syms, (x, y, m)) =>
      aggregate(syms,
        array().cast("array<string>"),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(x) && s === lit(y),
          concat(slice(acc, lit(1), size(acc) - lit(1)), array(lit(m))))
          .otherwise(concat(acc, array(s))))
    }
    val dict = words.select(col("w")).distinct()
      .select(col("w"), encoded.as("toks"))
    t("dict collect")(dict.collect())
    val joined = words.join(broadcast(dict), "w")
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    val planStr = joined.queryExecution.executedPlan.toString
    println("== fold appears in plan " +
      planStr.sliding(10).count(_ == "aggregate(") + " times; plan len " + planStr.length)
    t("join+agg")(joined.count())
    // materialized-dict variant: evaluate the fold ONCE on the 31 rows,
    // ship the RESULT
    val dictRows = dict.collect().toSeq
    val dictLocal = spark.createDataFrame(
      spark.sparkContext.parallelize(dictRows, 1), dict.schema)
    t("join+agg materialized dict") {
      words.join(broadcast(dictLocal), "w")
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"))
        .count()
    }
    spark.stop()
  }
}
