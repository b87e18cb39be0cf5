package graft
import org.apache.spark.sql.SparkSession
/** Dev-only probe: can Spark 4.1.2 read the driver's parquet (incl. ns timestamps)? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // is nanosAsLong runtime-settable?
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      println("== nanosAsLong runtime-settable: YES")
    } catch { case e: Throwable => println(s"== nanosAsLong runtime-settable: NO (${e.getMessage})") }
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    val fixed = Tables.normalizeTs(ev)
    fixed.printSchema()
    fixed.orderBy("event_id").show(3, false)
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.printSchema(); o.orderBy("o_orderkey").show(2, false)
    val e2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e2.printSchema()
    spark.stop()
  }
}
