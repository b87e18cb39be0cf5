package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK — the write-side twin of [[GenSource]],
  * demonstrating the commit protocol a distributed sink needs for
  * exactly-once output under task retries and speculation:
  *
  *  - each DataWriter streams its partition to a **staging file** named by
  *    (partition, task attempt) — concurrent attempts of the same
  *    partition never collide;
  *  - `commit()` on a writer returns a message naming its staged file;
  *    only messages from attempts Spark DECIDED won reach the driver;
  *  - `BatchWrite.commit` atomically renames exactly the committed
  *    attempts into the destination and writes a `_MANIFEST` (the
  *    all-or-nothing publish point — readers that require the manifest
  *    never see a torn write);
  *  - `abort` (task- or job-level) deletes staged files, so failed runs
  *    leave nothing visible.
  *
  * This is the same contract Hadoop output committers and the reference's
  * report sink implement; ReportSinkSpec drives it through a real
  * `df.write` AND pins the losing-attempt case the scheduler can't be
  * forced to produce deterministically. Lines are a text encoding of the
  * row (long/double/string columns), one file per partition. */
class ReportSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ReportTable(schema, properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

private class ReportTable(schema0: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "ReportSink requires .option(\"path\", ...)")
  override def name(): String = s"graft_report($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  // SupportsTruncate backs the advertised TRUNCATE capability: a
  // mode("overwrite") write plans as truncate-then-append, which here means
  // the commit clears previously-published part files before publishing the
  // new set — still behind the same all-or-nothing manifest rewrite.
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ReportBatchWrite(path, info.schema(), doTruncate)
      }
    }
}

private final case class StagedFile(partition: Int, staged: String)
  extends WriterCommitMessage

private class ReportBatchWrite(path: String, schema: StructType,
                               truncate: Boolean = false)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ReportWriterFactory(path, schema)

  // The publish point: only the winning attempts' files move into place,
  // then the manifest makes the directory visible as a unit. Under
  // truncate (overwrite mode) any previously-published part files not
  // re-written by this job are removed BEFORE the manifest rewrite, so the
  // manifest never names a deleted file.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val names = messages.map { case StagedFile(p, staged) =>
      val name = f"part-$p%05d.txt"
      Files.move(Paths.get(staged), dir.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      name
    }
    if (truncate) {
      val keep = names.toSet
      // listFiles(), not Files.list: the stream variant holds a directory
      // fd until closed, and an unclosed one leaks a handle per overwrite
      // commit for the JVM lifetime.
      Option(dir.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
        val n = f.getName
        if (n.startsWith("part-") && n.endsWith(".txt") && !keep.contains(n))
          Files.deleteIfExists(f.toPath)
      }
    }
    Files.write(dir.resolve("_MANIFEST"),
      names.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
  }
  // Spark's contract allows null slots for tasks that failed before
  // committing — a MatchError on one would mask the original job failure
  // and strand the other attempts' staged files.
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.iterator.filter(_ != null).foreach { case StagedFile(_, staged) =>
      Files.deleteIfExists(Paths.get(staged))
    }
}

private class ReportWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ReportWriter(path, schema, partitionId, taskId)
}

/** Streams rows to `<path>/_staging/p<partition>-t<task>`; commit hands the
  * staged path to the driver, abort deletes it. Exposed within the package
  * so the spec can run two attempts of one partition side by side. */
private[sources] class ReportWriter(path: String, schema: StructType,
                                    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val staged = {
    val d = Paths.get(path, "_staging")
    Files.createDirectories(d)
    d.resolve(s"p$partitionId-t$taskId").toString
  }
  private val out = Files.newBufferedWriter(Paths.get(staged))

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => row.getUTF8String(i).toString
        case t => throw new UnsupportedOperationException(s"ReportSink: $t")
      }
    }.mkString("|")
    out.write(line); out.newLine()
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(partitionId, staged)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(Paths.get(staged)) }
  override def close(): Unit = ()
}

private[graft] object ReportSinkAccess {
  def writer(path: String, schema: StructType, partitionId: Int,
             taskId: Long): DataWriter[InternalRow] =
    new ReportWriter(path, schema, partitionId, taskId)
  def batchWrite(path: String, schema: StructType): BatchWrite =
    new ReportBatchWrite(path, schema)
}
