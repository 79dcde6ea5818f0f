package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftgen` — a custom DataSource V2 connector: a deterministic row
  * generator (no files, no network) with the three scan optimizations a
  * real connector owes the planner:
  *
  *  - '''partition planning''': the id range splits into `partitions`
  *    even slices, one `InputPartition` each — reader parallelism is a
  *    first-class property of the source, not an afterthought
  *    repartition;
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): conjunctive
  *    range predicates on `id` NARROW THE GENERATED RANGE — excluded
  *    rows are never materialized at all (the connector analogue of
  *    parquet row-group skipping). Consumed filters are removed from
  *    the post-scan re-check; everything else stays Catalyst's job;
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): the
  *    reader computes exactly the projected fields, in the pruned
  *    order.
  *
  * Row content is pure integer arithmetic on `id` (multiplicative-hash
  * mod idiom), so an external engine replays it exactly —
  * `scan_dsv2_pushdown`'s DuckDB oracle derives the same rows from
  * `range()`. At 100 TB the same interface is how a real connector
  * (message bus, KV store, tensor store) binds splits to tasks and
  * keeps selective queries |match|-proportional.
  *
  * Usage: `spark.read.format("graftgen").option("rows", n)
  * .option("partitions", p).load()`.
  */
class GraftGen extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGen.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(8)
    new GenTable(rows, parts)
  }
}

object GraftGen {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("grp", StringType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  /** The deterministic row functions — pure int64 arithmetic, replayable
    * verbatim in the oracle's SQL dialect. */
  def kOf(id: Long): Int = ((id * 2654435761L) % 97L).toInt
  def grpOf(id: Long): String = "g" + (id % 10L)
  def valOf(id: Long): Double = ((id * 13L + 7L) % 1000L).toDouble / 10.0
}

private[sources] class GenTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GraftGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

private[sources] class GenScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftGen.Schema

  /** Consume id-range conjuncts into [lo, hi); leave the rest to Spark.
    * Returned array = filters Spark must STILL evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, leave) = filters.partition {
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case EqualTo("id", _: java.lang.Long) => true
      case _ => false
    }
    take.foreach {
      case GreaterThan("id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = take
    leave
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GenScan(lo, math.max(lo, hi), parts, required)
}

private[sources] class GenScan(lo: Long, hi: Long, parts: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen pushedRange=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val width = math.max(1L, (n + parts - 1) / parts)
    (0 until parts).iterator
      .map(p => (lo + p * width, math.min(hi, lo + (p + 1) * width)))
      .filter { case (s, e) => s < e }
      .map { case (s, e) => GenInputPartition(s, e): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
}

private[sources] final case class GenInputPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class GenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new GenReader(p.start, p.end, required)
  }
}

private[sources] class GenReader(start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  // bind the pruned projection once, not per row
  private val fields: Array[Long => Any] = required.fieldNames.map {
    case "id" => (i: Long) => i
    case "k" => (i: Long) => GraftGen.kOf(i)
    case "grp" => (i: Long) => UTF8String.fromString(GraftGen.grpOf(i))
    case "val" => (i: Long) => GraftGen.valOf(i)
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }
  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow =
    new GenericInternalRow(fields.map(f => f(id)).asInstanceOf[Array[Any]])
  override def close(): Unit = ()
}
