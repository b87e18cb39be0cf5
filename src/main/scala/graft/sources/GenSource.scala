package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector — the source-extension tier of §2.1,
  * proving the engine's source abstraction is not file-coupled (the batch
  * face of MemorySourceSpec's broker-shaped stream source): a deterministic
  * generator table `spark.read.format("graft.sources.GenSource")` with the
  * three properties a real connector (Kafka, JDBC, a feature store) needs
  * at 100 TB:
  *
  *  - **parallel splits**: `parts` InputPartitions of contiguous id ranges,
  *    planned source-side — executors read disjoint slices, no driver
  *    bottleneck;
  *  - **filter pushdown with partition pruning**: id-range conjuncts fold
  *    into [lo, hi] bounds INSIDE the source; splits that fall outside are
  *    never planned (the DSv2 analogue of parquet row-group pruning), and
  *    accepted filters are reported exactly so Catalyst drops its own
  *    re-evaluation;
  *  - **column pruning**: the reader materializes only the pruned schema —
  *    a projection of 1 column generates 1 column.
  *
  * Row content is pure integer arithmetic on the id (LCG step, modular
  * user bucket, 5-way type code), bit-identical to the DuckDB oracle's
  * `range()` reconstruction — which makes a from-thin-air source
  * hash-checkable by the driver's gate. */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GenTable
  override def supportsExternalMetadata(): Boolean = false
}

object GenSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("v", LongType, nullable = false)))

  val types: Array[UTF8String] =
    Array("click", "view", "purchase", "error", "scroll").map(UTF8String.fromString)

  def userId(id: Long): Long = id % 997L
  def typeCode(id: Long): Int = (id % 5L).toInt
  def value(id: Long): Long = (id * 1103515245L + 12345L) % 2147483648L
}

private class GenTable extends Table with SupportsRead {
  override def name(): String = "graft_gen"
  override def schema(): StructType = GenSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(
      rows = options.getLong("rows", 1000L),
      parts = options.getInt("parts", 4))
}

private class GenScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows - 1
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GenSource.fullSchema

  // id-range conjuncts fold into [lo, hi]; everything else stays with
  // Catalyst. Accepted filters are exact (the generator emits nothing
  // outside the bounds), so they are NOT returned for re-evaluation.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case IsNotNull("id") => true
      case _ => false
    }
    ours.foreach {
      case EqualTo("id", x: Long) => lo = math.max(lo, x); hi = math.min(hi, x)
      case GreaterThan("id", x: Long) => lo = math.max(lo, x + 1)
      case GreaterThanOrEqual("id", x: Long) => lo = math.max(lo, x)
      case LessThan("id", x: Long) => hi = math.min(hi, x - 1)
      case LessThanOrEqual("id", x: Long) => hi = math.min(hi, x)
      case _ => () // IsNotNull: id is never null
    }
    accepted = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GenScan(rows, parts, lo, hi, required)
}

private case class GenPartition(start: Long, end: Long) extends InputPartition

private class GenScan(rows: Long, parts: Int, lo: Long, hi: Long,
                      required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GenScan rows=$rows bounds=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  // Contiguous id-range splits; splits wholly outside [lo, hi] are pruned
  // here, before Spark schedules a single task for them.
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map { k => GenPartition(math.max(k * per, lo), math.min((k + 1) * per - 1, hi)) }
      .filter(p => p.start <= p.end)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)
}

private class GenReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id <= p.end }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "id" => id
          case "user_id" => GenSource.userId(id)
          case "event_type" => GenSource.types(GenSource.typeCode(id))
          case "v" => GenSource.value(id)
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
