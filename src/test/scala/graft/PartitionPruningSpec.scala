package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning over the date-partitioned events layout
  * (Tables.eventsByDay): static pruning must appear as a PartitionFilters
  * entry at the scan, dynamic partition pruning as a dynamicpruning
  * subquery when the filter arrives through a join — the two mechanisms a
  * partitioned 100 TB table depends on. */
class PartitionPruningSpec extends AnyFunSuite with SparkFixture {

  test("day filter reaches the scan as a PartitionFilter (static pruning)") {
    val df = Tables.eventsByDay(spark, sf)
      .filter(col("day") === lit("2024-01-10").cast("date"))
      .select(col("event_id"), col("day"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day") ||
      plan.contains("PartitionFilters: [(day"),
      s"no partition filter at the scan:\n$plan")
    // and the values match the unpartitioned source
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit("2024-01-10").cast("date")).count()
    assert(rows.length.toLong == expected && expected > 0)
  }

  test("join against a filtered dim triggers dynamic partition pruning") {
    val confs = Seq(
      // stats on the tiny local table would talk the optimizer out of it;
      // production fact tables pass the benefit estimate on their own
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // dim must come from a file source with a real Filter on it — a
      // filtered LocalRelation is constant-folded away and DPP's
      // selective-predicate detection never sees it
      val dimPath = new java.io.File(sys.props("java.io.tmpdir"), "graft_dpp_dim").getAbsolutePath
      Seq(("2024-01-10", "campaign_a"), ("2024-01-11", "campaign_a"), ("2024-01-20", "other"))
        .toDF("d", "campaign")
        .select(col("d").cast("date").as("d"), col("campaign"))
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("campaign") === "campaign_a")
      val joined = Tables.eventsByDay(spark, sf)
        .join(dim, col("day") === col("d"))
        .groupBy(col("campaign")).agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.length == 1 && rows.forall(_.getLong(1) > 0))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in:\n$plan")
    } finally {
      old.foreach { case (k, v) =>
        v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
      }
    }
  }

  test("eventsByDay cache invalidates when the source file regenerates") {
    // round-2 defect: the partitioned copy was keyed by path hash alone,
    // so in-place testdata regeneration silently served STALE data. The
    // key now fingerprints (size, mtime); changing the source must route
    // to a fresh partitioned copy.
    val tmp = java.nio.file.Files.createTempDirectory("graft_ebd_src_").toFile
    val srcFile = new java.io.File(tmp, "events.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), srcFile.toPath)
    def cacheDir(): String = {
      val f = Tables.eventsByDay(spark, tmp.getAbsolutePath).inputFiles.head
      f.substring(0, f.indexOf("/day="))
    }
    val first = cacheDir()
    assert(srcFile.setLastModified(srcFile.lastModified() + 120000))
    val second = cacheDir()
    assert(first != second,
      s"regenerated source still served from stale cache $first")
  }
}
