package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 batch connector: a deterministic synthetic
  * document corpus (`doc_id`, `text`), demonstrating the full custom-
  * source surface the engine builds on —
  *
  *  - `TableProvider`/`SupportsRead`/`Scan`/`Batch` plumbing;
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only requested fields (`ReadSchema` in the plan);
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): doc_id range
  *    predicates narrow the generated id range BEFORE partition
  *    planning, so pruning removes whole input partitions (the DSv2
  *    analog of parquet row-group pruning);
  *  - PARTITION PLANNING: the (narrowed) range splits into fixed-size
  *    chunks — at scale, partition count tracks the data actually read,
  *    not the table size.
  *
  * Usage: `spark.read.format(classOf[SyntheticDocsSource].getName)
  *   .option("rows", n).option("chunk", c).load()`.
  */
class SyntheticDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val chunk = Option(properties.get("chunk")).map(_.toLong).getOrElse(250L)
    new SyntheticDocsTable(rows, chunk)
  }
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val vocab = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliett", "kilo", "lima")

  /** Deterministic 8-word pseudo-text (multiplicative hash of (id, pos)). */
  def textOf(id: Long): String =
    (0 until 8).map { w =>
      vocab((((id * 8 + w) * 2654435761L + 17L) % 4294967296L % vocab.length).toInt)
    }.mkString(" ")
}

class SyntheticDocsTable(rows: Long, chunk: Long) extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, chunk)
}

class SyntheticDocsScanBuilder(rows: Long, chunk: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SyntheticDocs.schema
  private var countPushed = false

  // COMPLETE aggregate pushdown for ungrouped COUNT(*): the source knows
  // the (filter-narrowed) cardinality exactly, so the scan answers with
  // one row and Spark plans NO aggregation at all. Filters are pushed
  // before aggregates, so the count composes with range pruning.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
  override def pushAggregation(agg: Aggregation): Boolean = {
    countPushed = supportCompletePushDown(agg)
    countPushed
  }

  // doc_id range predicates narrow [lo, hi) before partition planning;
  // everything else stays a post-scan filter (returned as remainder)
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    supported.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    if (countPushed) new SyntheticDocsCountScan(lo, hi)
    else new SyntheticDocsScan(lo, hi, chunk, required)
}

/** Complete COUNT(*) pushdown: one partition, one row, zero row reads. */
class SyntheticDocsCountScan(lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count_star", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs COUNT pushdown range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(IdRangePartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val n = math.max(0L, hi - lo)
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](n))
      override def close(): Unit = ()
    }
  }
}

case class IdRangePartition(start: Long, end: Long) extends InputPartition

class SyntheticDocsScan(lo: Long, hi: Long, chunk: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range=[$lo,$hi) chunk=$chunk cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    (lo until hi by chunk)
      .map(s => IdRangePartition(s, math.min(s + chunk, hi)): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames // serialize only the field list
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[IdRangePartition]
      new PartitionReader[InternalRow] {
        private var id = p.start - 1
        override def next(): Boolean = { id += 1; id < p.end }
        override def get(): InternalRow =
          new GenericInternalRow(fields.map {
            case "doc_id" => id
            case "text" => UTF8String.fromString(SyntheticDocs.textOf(id))
          }.asInstanceOf[Array[Any]])
        override def close(): Unit = ()
      }
    }
  }
}
