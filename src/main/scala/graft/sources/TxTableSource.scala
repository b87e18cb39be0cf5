package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.GraftSqlInternal
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.tables.TxTable

/** Streams a [[graft.tables.TxTable]] — the table-as-stream face that
  * closes the ingest loop (`StreamOps.txTableSink` streams IN; this
  * streams OUT), the Delta-source pattern: offsets are table VERSIONS,
  * each micro-batch is the manifest DIFF of `(startV, endV]` read as a
  * batch DataFrame, so an incremental consumer reads exactly the
  * appended files — never the table. The version offset rides the
  * checkpoint: a restarted query resumes at the committed version and
  * sees appends made while it was down exactly once.
  *
  * Versions that REWROTE files (merge/compact/z-order/delete) hold
  * rewritten history in their added files, not new rows: the default
  * FAILS the stream loudly; `skipChangeCommits=true` skips those
  * versions whole. Both behaviors — and that a skipped compaction
  * causes neither loss nor duplication — are spec-pinned.
  *
  * `readChangeFeed=true` streams the ROW-LEVEL change feed instead
  * (the Delta CDF-as-stream face): each micro-batch is
  * `rowChangesBetween(startV, endV]` — every row tagged
  * insert/delete + `_commit_version` — so change commits are the
  * PAYLOAD, not a hazard (a compaction diffs to zero rows, a merge to
  * exactly its changed rows). This is what feeds continuous
  * replication: [[graft.streaming.StreamOps.txReplicaSink]] folds the
  * feed into a replica TxTable exactly once per micro-batch.
  *
  * V1 `Source` is deliberate (the same API Delta ships on): `getBatch`
  * may plan its result with the full SQL parquet reader and re-wrap it
  * as a streaming frame, where a DSv2 `PartitionReader` would have to
  * decode parquet by hand. Usage:
  * {{{
  *   spark.readStream.format("graft.sources.TxTableSource")
  *     .option("path", tableRoot)
  *     .option("skipChangeCommits", "true")     // optional
  *     .option("maxVersionsPerTrigger", "2")    // optional backpressure
  *     .load()
  * }}}
  *
  * Implements [[SupportsTriggerAvailableNow]] for real: AvailableNow pins
  * the end version at query start and drains to it in
  * admission-controlled batches (`maxVersionsPerTrigger` versions each)
  * rather than the engine's single-uncontrolled-batch fallback.
  */
class TxTableSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-txtable"

  private def tableOf(parameters: Map[String, String]): TxTable = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-txtable source requires option 'path'"))
    new TxTable(root, Seq.empty)
  }

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-txtable", schema.getOrElse {
      val t = tableOf(parameters)
      require(t.currentVersion > 0,
        s"cannot infer a schema from empty table ${t.root}; pass .schema(...)")
      val base = t.read(sqlContext.sparkSession).schema
      if (cdfOf(parameters))
        base.add("_change_type", org.apache.spark.sql.types.StringType)
          .add("_commit_version", org.apache.spark.sql.types.LongType)
      else base
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val declared = sourceSchema(sqlContext, schema, providerName, parameters)._2
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toInt)
    maxVersions.foreach(n => require(n > 0, s"maxVersionsPerTrigger must be positive, got $n"))
    val cdf = cdfOf(parameters)
    require(!(cdf && parameters.get("skipChangeCommits").exists(_.toBoolean)),
      "readChangeFeed streams change commits as rows; skipChangeCommits does not compose")
    // INCLUSIVE, matching Delta's streaming option of the same name:
    // `startingVersion=V` means changes starting AT version V are read
    // (so a snapshot bootstrap through version B passes B+1). Version 1
    // is the first commit; absent = the whole history.
    val startingVersion = parameters.get("startingVersion").map(_.toInt)
    startingVersion.foreach(v => require(v >= 1,
      s"startingVersion is the first version READ (inclusive, the Delta " +
        s"semantics) and must be >= 1, got $v"))
    new TxTableStreamSource(sqlContext, tableOf(parameters), declared,
      skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean),
      maxVersionsPerTrigger = maxVersions,
      readChangeFeed = cdf,
      startAfter = startingVersion.map(_ - 1).getOrElse(0))
  }
}

private class TxTableStreamSource(sqlContext: SQLContext, table: TxTable,
    override val schema: StructType, skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Int], readChangeFeed: Boolean = false,
    startAfter: Int = 0)
  extends Source with SupportsTriggerAvailableNow {

  /** A missing offset means "nothing consumed yet": the read begins AFTER
    * `startAfter` (= the user-facing `startingVersion` option minus one —
    * that option is INCLUSIVE like Delta's; 0 = the whole history). The
    * snapshot-bootstrap pattern: a replica copies the source AT B once,
    * then streams only the tail with `startingVersion=B+1` instead of
    * replaying every version since v0. Once a checkpoint exists it wins:
    * the option only seeds the FIRST run, the Delta semantics. */
  private def version(o: AnyRef): Int = o match {
    case null => startAfter
    case LongOffset(v) => v.toInt
    case so: SerializedOffset => LongOffset(so).offset.toInt
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  /** End version pinned at query start by [[prepareForTriggerAvailableNow]]:
    * an AvailableNow run drains to the snapshot it saw when it started and
    * terminates — a producer committing DURING the run is left, whole, for
    * the next run's checkpointed restart (the FileStreamSource contract;
    * without this the engine falls back to one uncontrolled batch). */
  private var availableNowEnd: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.currentVersion)

  /** The admission unit is a table VERSION (= one commit's file set —
    * capping versions caps files read per batch, Delta's maxFilesPerTrigger
    * shape); `ReadMaxFiles` is the engine's carrier for that count. */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  /** Next batch's end version: the current snapshot (or the AvailableNow
    * pin), held back to at most `maxVersionsPerTrigger` new versions; null
    * when caught up, which ends an AvailableNow run. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = version(start)
    val ceiling = availableNowEnd.getOrElse(table.currentVersion)
    val to = limit match {
      case f: ReadMaxFiles => math.min(ceiling, from + f.maxFiles())
      case _ => ceiling
    }
    if (to <= from) null else LongOffset(to.toLong)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val v = table.currentVersion
    if (v == 0) null else LongOffset(v.toLong)
  }

  /** Latest committed table version; None before the first commit. Kept
    * for the V1 `Source` contract — the engine routes admission-control
    * sources through [[latestOffset]] instead. */
  override def getOffset: Option[OffsetV1] = {
    val v = table.currentVersion
    if (v == 0) None else Some(LongOffset(v.toLong))
  }

  /** The appended rows of versions (start, end], conformed to the
    * declared schema (a later schema-evolved append may carry columns an
    * early batch's files lack — those read NULL, the table's own read
    * rule) and re-wrapped as a streaming frame. */
  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromV = start.map(version).getOrElse(startAfter)
    val toV = version(end)
    val changes =
      if (readChangeFeed)
        table.rowChangesBetween(sqlContext.sparkSession, fromV, toV)
      else
        table.changesBetween(sqlContext.sparkSession, fromV, toV, skipChangeCommits)
    val conformed = changes.select(schema.fieldNames.map { name =>
      if (changes.columns.contains(name)) col(name)
      else lit(null).cast(schema(name).dataType).as(name)
    }.toSeq: _*)
    GraftSqlInternal.ofStreamingBatch(conformed)
  }

  override def stop(): Unit = ()
}
