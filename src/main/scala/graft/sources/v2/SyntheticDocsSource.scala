package graft.sources.v2

import java.util

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
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
  *    not the table size;
  *  - AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`): ungrouped
  *    COUNT(*)/COUNT(doc_id)/MIN/MAX/SUM(doc_id) are answered in closed
  *    form from the narrowed range — one row, zero row reads;
  *  - STATISTICS (`SupportsReportStatistics`): filter-narrowed
  *    rowcount/bytes feed join sizing (auto-broadcast without a hint);
  *  - RUNTIME FILTERING (`SupportsRuntimeFiltering`): dynamic partition
  *    pruning over a custom source — when the scan sits under a join
  *    whose other side is small and selective, Spark executes that side
  *    first, pushes the join-key values back into the scan as an IN
  *    filter, and the scan RE-PLANS its partitions to just the chunks
  *    holding requested ids (readers then emit only member rows);
  *  - COLUMNAR READS (`supportColumnarReads` + `ColumnarBatch` of
  *    `OnHeapColumnVector`s): the default read path hands Spark whole
  *    vectorized batches instead of row-at-a-time `InternalRow`s — the
  *    Tungsten scan shape (`ColumnarToRow` above the scan in the plan,
  *    amortized per-batch virtual calls). `.option("columnar", false)`
  *    selects the row path; both paths share partition planning.
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
    // a chunk becomes one reader partition whose row count must fit an
    // Int ((end - start).toInt in the columnar factory) — reject instead
    // of silently wrapping into an empty/corrupt scan
    require(chunk >= 1 && chunk <= Int.MaxValue,
      s"chunk must be in [1, ${Int.MaxValue}], got $chunk")
    val columnar = Option(properties.get("columnar")).forall(_.toBoolean)
    new SyntheticDocsTable(rows, chunk, columnar)
  }
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val vocab = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliett", "kilo", "lima")

  /** Deterministic 8-word pseudo-text (multiplicative hash of (id, pos)).
    * floorMod, not %: the hash product wraps Long past id ~4.3e8, and a
    * negative remainder would index vocab out of bounds. */
  def textOf(id: Long): String =
    (0 until 8).map { w =>
      vocab(java.lang.Math.floorMod(
        java.lang.Math.floorMod((id * 8 + w) * 2654435761L + 17L, 4294967296L),
        vocab.length.toLong).toInt)
    }.mkString(" ")
}

class SyntheticDocsTable(rows: Long, chunk: Long, columnar: Boolean = true)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, chunk, columnar)
}

class SyntheticDocsScanBuilder(rows: Long, chunk: Long, columnar: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SyntheticDocs.schema
  private var pushedAggs = Array.empty[String]

  // COMPLETE aggregate pushdown for ungrouped COUNT(*)/COUNT(doc_id)/
  // MIN/MAX/SUM(doc_id): the source knows the (filter-narrowed) id range
  // [lo, hi) in closed form, so the scan answers with one row and Spark
  // plans NO aggregation at all. Filters are pushed before aggregates, so
  // every answer composes with range pruning. Spark only attempts the
  // complete form when no post-scan filter remains, so partially-pushed
  // predicates fall back to the row scan automatically.
  private def tokenOf(f: AggregateFunc): Option[String] = f match {
    case _: CountStar => Some("count")
    // doc_id is non-null by schema, so COUNT(doc_id) == COUNT(*)
    case c: Count if !c.isDistinct && isDocId(c.column) => Some("count")
    case m: Min if isDocId(m.column) => Some("min")
    case m: Max if isDocId(m.column) => Some("max")
    case s: Sum if !s.isDistinct && isDocId(s.column) => Some("sum")
    case _ => None
  }
  private def isDocId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(tokenOf(_).isDefined)
  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      pushedAggs = agg.aggregateExpressions.flatMap(tokenOf)
      true
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
    // v+1 at Long.MaxValue wraps to Long.MinValue — and these filters are
    // CONSUMED (not residual), so the wrap would be silently-wrong rows,
    // not a perf bug. Saturate instead: > MaxValue matches nothing
    // (empty range), <= MaxValue matches everything (hi unchanged).
    supported.foreach {
      case GreaterThan("doc_id", v: Long) =>
        lo = if (v == Long.MaxValue) Long.MaxValue else math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v)
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    if (pushedAggs.nonEmpty) new SyntheticDocsAggScan(lo, hi, pushedAggs)
    else new SyntheticDocsScan(lo, hi, chunk, required, columnar)
}

/** Complete aggregate pushdown: one partition, one row, zero row reads.
  * Output columns are positional, one per pushed aggregate; MIN/MAX/SUM
  * are NULL on an empty (fully-pruned) range, COUNT is 0.
  */
class SyntheticDocsAggScan(lo: Long, hi: Long, aggs: Array[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggs.zipWithIndex.map { case (a, i) =>
      StructField(s"${a}_$i", LongType, nullable = a != "count")
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs AGG pushdown [${aggs.mkString(",")}] range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(IdRangePartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val n = math.max(0L, hi - lo)
    // sum of [lo, hi) = n*(lo+hi-1)/2; BigInt intermediate avoids overflow
    // before the halving even though the result fits a long for our sizes
    val values: Array[Any] = aggs.map {
      case "count" => n
      case "min" => if (n == 0) null else lo
      case "max" => if (n == 0) null else hi - 1
      case "sum" =>
        if (n == 0) null
        else ((BigInt(lo) + BigInt(hi - 1)) * BigInt(n) / 2).toLong
    }
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
  }
}

case class IdRangePartition(start: Long, end: Long) extends InputPartition

/** One runtime-pruned chunk: only the surviving ids, already sorted. */
case class IdSetPartition(ids: Array[Long]) extends InputPartition

/** Driver-side observability for specs: what the runtime filter delivered
  * and how many partitions the re-plan produced. (Runtime filtering has no
  * explain-visible marker — the filter arrives AFTER planning — so tests
  * read these instead.)
  */
object SyntheticDocsRuntime {
  @volatile var lastFilterIds: Array[Long] = Array.empty
  @volatile var lastPlannedPartitions: Int = -1
  def reset(): Unit = { lastFilterIds = Array.empty; lastPlannedPartitions = -1 }
}

class SyntheticDocsScan(lo: Long, hi: Long, chunk: Long, required: StructType,
    columnar: Boolean = true)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  // Runtime (post-planning) IN-set from dynamic partition pruning; None
  // until Spark pushes one. Mutated driver-side only, before re-planning.
  private var runtimeAllowed: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))

  // Best-effort by contract: the values come FROM the join condition, so
  // dropping non-members is safe and keeping extras is also safe (the
  // join re-checks). We intersect with the compile-time range and keep
  // the exact membership set for row-level skipping.
  override def filter(filters: Array[Filter]): Unit = {
    filters.foreach {
      case In("doc_id", vs) =>
        val ids = vs.collect { case l: Long => l }.distinct.sorted
          .filter(id => id >= lo && id < hi)
        runtimeAllowed = Some(runtimeAllowed.fold(ids)(_.intersect(ids)))
      case EqualTo("doc_id", v: Long) =>
        val ids = Array(v).filter(id => id >= lo && id < hi)
        runtimeAllowed = Some(runtimeAllowed.fold(ids)(_.intersect(ids)))
      case _ => () // unsupported runtime filter shapes are ignored
    }
    SyntheticDocsRuntime.lastFilterIds = runtimeAllowed.getOrElse(Array.empty)
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range=[$lo,$hi) chunk=$chunk cols=${required.fieldNames.mkString(",")}"
  // FILTER-NARROWED statistics: the optimizer sizes this relation from the
  // pruned range, not the table cardinality — so a tightly-filtered scan
  // auto-qualifies as the broadcast side of a join with no hint. Row width
  // is doc_id (8) + the 8-word text (~52 chars UTF-8 + offsets).
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    private val rowBytes =
      required.fieldNames.map { case "doc_id" => 8L; case "text" => 60L }.sum.max(1L)
    override def sizeInBytes: OptionalLong = OptionalLong.of(n * rowBytes)
    override def numRows: OptionalLong = OptionalLong.of(n)
  }
  override def planInputPartitions(): Array[InputPartition] = {
    val parts: Array[InputPartition] = runtimeAllowed match {
      case Some(ids) =>
        // one partition per surviving chunk, carrying exactly its members
        ids.groupBy(_ / chunk).toArray.sortBy(_._1)
          .map { case (_, chunkIds) => IdSetPartition(chunkIds.sorted) }
      case None =>
        (lo until hi by chunk)
          .map(s => IdRangePartition(s, math.min(s + chunk, hi)): InputPartition)
          .toArray
    }
    SyntheticDocsRuntime.lastPlannedPartitions = parts.length
    parts
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames // serialize only the field list
    if (columnar)
      new SyntheticDocsColumnarFactory(fields, math.min(chunk, 4096L).toInt)
    else {
      // a function VAL, not a def: a local def lifts to an instance method
      // and the factory lambda would capture the non-serializable Scan
      val rowOf: Long => InternalRow = id =>
        new GenericInternalRow(fields.map {
          case "doc_id" => id
          case "text" => UTF8String.fromString(SyntheticDocs.textOf(id))
        }.asInstanceOf[Array[Any]])
      (partition: InputPartition) =>
        partition match {
          case p: IdRangePartition =>
            new PartitionReader[InternalRow] {
              private var id = p.start - 1
              override def next(): Boolean = { id += 1; id < p.end }
              override def get(): InternalRow = rowOf(id)
              override def close(): Unit = ()
            }
          case p: IdSetPartition =>
            new PartitionReader[InternalRow] {
              private var i = -1
              override def next(): Boolean = { i += 1; i < p.ids.length }
              override def get(): InternalRow = rowOf(p.ids(i))
              override def close(): Unit = ()
            }
        }
    }
  }
}

/** Vectorized read path: fills `OnHeapColumnVector`s a batch at a time and
  * hands Spark whole `ColumnarBatch`es — the same scan shape as the
  * vectorized parquet reader (`ColumnarToRow` in the plan; per-batch, not
  * per-row, iterator overhead). Works for both plain range chunks and
  * runtime-pruned id-set partitions.
  */
class SyntheticDocsColumnarFactory(fields: Array[String], batchSize: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("columnar-only scan")
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val (count, idAt): (Int, Int => Long) = p match {
      case r: IdRangePartition => ((r.end - r.start).toInt, i => r.start + i)
      case s: IdSetPartition => (s.ids.length, s.ids.apply)
    }
    new PartitionReader[ColumnarBatch] {
      private val schema = StructType(fields.map(SyntheticDocs.schema(_)))
      private val vectors = OnHeapColumnVector.allocateColumns(batchSize, schema)
      private val batch = new ColumnarBatch(vectors.asInstanceOf[Array[ColumnVector]])
      private var pos = 0
      override def next(): Boolean =
        if (pos >= count) false
        else {
          val n = math.min(batchSize, count - pos)
          var c = 0
          while (c < fields.length) {
            val v = vectors(c)
            v.reset()
            fields(c) match {
              case "doc_id" =>
                var i = 0
                while (i < n) { v.putLong(i, idAt(pos + i)); i += 1 }
              case "text" =>
                var i = 0
                while (i < n) {
                  val b = SyntheticDocs.textOf(idAt(pos + i))
                    .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  v.putByteArray(i, b, 0, b.length)
                  i += 1
                }
            }
            c += 1
          }
          batch.setNumRows(n)
          pos += n
          true
        }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}
