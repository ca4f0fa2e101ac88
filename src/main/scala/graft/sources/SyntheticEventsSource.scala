package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector — the extension point a bespoke
  * 100 TB store plugs into — implemented over a deterministic synthetic
  * event generator so every claimed integration is testable offline:
  *
  *   - `TableProvider` → `Table` → `ScanBuilder` lifecycle;
  *   - **filter pushdown** (`SupportsPushDownFilters`): range/equality
  *     predicates on `id` narrow the generated key space at PLANNING
  *     time, so partitions that would produce no surviving rows are
  *     never even scheduled — the DSv2 analog of parquet row-group
  *     pruning / JDBC WHERE pushdown. Non-id filters are left for Spark
  *     to evaluate (returned as postScanFilters), exactly the
  *     accepted/residual split the V2 contract prescribes;
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *     materialize only the pruned schema — a column never requested is
  *     never computed (the generator's stand-in for columnar IO);
  *   - **split planning**: the key range divides into `splits` input
  *     partitions, each read by an independent `PartitionReader` —
  *     executor-side parallelism with no driver materialization.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SyntheticEventsSource")
  *     .option("rows", "100000").option("splits", "8").load()
  * }}}
  *
  * Row content is a pure function of `id` (LCG-style mixing), so reads
  * are deterministic across runs, partitionings, and push-down shapes.
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("splits", "4").toInt,
      properties.getOrDefault("ratePerBatch", "100").toLong)
}

object SyntheticEventsSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val Kinds = Array("click", "view", "purchase")

  /** Deterministic row content for key `id`. */
  def userOf(id: Long): Long = (id * 2654435761L >>> 16) % 97
  def kindOf(id: Long): String = Kinds(((id * 40503L >>> 8) % 3).toInt)
  def valueOf(id: Long): Double = ((id * 1103515245L + 12345L) % 1000L).toDouble / 10.0
}

private class SyntheticEventsTable(rows: Long, splits: Int, rate: Long)
  extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows)"
  override def schema(): StructType = SyntheticEventsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, splits, rate)
}

/** Planning-time state: the id range narrowed by accepted filters, the
  * schema narrowed by column pruning, and (when the whole aggregation is
  * answerable from the range arithmetic alone) a pushed-down aggregate. */
private class SyntheticScanBuilder(rows: Long, splits: Int, rate: Long)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var lo: Long = 0L              // inclusive
  private var hi: Long = rows            // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticEventsSource.Schema
  private var aggFuncs: Option[Seq[AggregateFunc]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v)            => val x = num(v); lo = math.max(lo, x); hi = math.min(hi, x + 1)
      case GreaterThan("id", v)        => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, num(v))
      case LessThan("id", v)           => hi = math.min(hi, num(v))
      case LessThanOrEqual("id", v)    => hi = math.min(hi, num(v) + 1)
      case _                           =>
    }
    pushed = accepted
    // Accepted filters are EXACT on this source (the generator honors the
    // narrowed range precisely), so only the residual needs re-evaluation.
    residual
  }

  private def num(v: Any): Long = v match {
    case l: java.lang.Long    => l
    case i: java.lang.Integer => i.toLong
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*), MIN(id), MAX(id) over the (already filter-narrowed) key
    * range are pure range arithmetic — COMPLETE pushdown: the scan emits
    * one pre-aggregated row and no generator runs at all. Anything else
    * (grouping, other columns, SUM/AVG) is declined and Spark aggregates
    * the ordinary scan. */
  private def isIdRef(e: V2Expression): Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
    case _                  => false
  }

  private def supported(a: Aggregation): Boolean =
    a.groupByExpressions().isEmpty && a.aggregateExpressions().nonEmpty &&
      a.aggregateExpressions().forall {
        case _: CountStar => true
        case m: Min => isIdRef(m.column())
        case m: Max => isIdRef(m.column())
        case _ => false
      }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    supported(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!supported(aggregation)) return false
    aggFuncs = Some(aggregation.aggregateExpressions().toSeq)
    true
  }

  override def build(): Scan = aggFuncs match {
    case Some(funcs) => new SyntheticAggScan(lo, hi, funcs)
    case None        => new SyntheticScan(lo, hi, splits, rate, pushed, required)
  }
}

/** Completely-pushed aggregate: one partition, one row, zero generator
  * work — the DSv2 analog of answering COUNT(*) from table metadata. */
private class SyntheticAggScan(lo: Long, hi: Long, funcs: Seq[AggregateFunc])
  extends Scan with Batch {

  private val empty = hi <= lo

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i)            => StructField(s"agg_$i", LongType, nullable = true)
  })

  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticEvents AGG-PUSHDOWN range=[$lo,$hi) funcs=${funcs.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(0, 1))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: IndexedSeq[Any] = funcs.toIndexedSeq.map {
      case _: CountStar => math.max(0L, hi - lo)
      case _: Min       => if (empty) null else lo
      case _: Max       => if (empty) null else hi - 1
      case _            => null
    }
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(values)
          override def close(): Unit = ()
        }
    }
  }
}

private class SyntheticScan(
    lo: Long, hi: Long, splits: Int, rate: Long,
    pushed: Array[Filter], required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticEvents range=[$lo,$hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1L, hi - lo)
    val per = math.max(1L, (n + splits - 1) / splits)
    (lo until hi by per)
      .map(s => SyntheticPartition(s, math.min(s + per, hi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new SyntheticMicroBatchStream(lo, hi, splits, rate, required)
}

/** Streaming half of the connector: the id space is the offset space.
  * Admission control comes through `SupportsAdmissionControl` — Spark
  * hands `latestOffset(start, limit)` the CURRENT start offset, so the
  * source is stateless across restarts by construction (the naive no-arg
  * `latestOffset` must track a driver-side high-water mark, and a fresh
  * post-restart instance would regress it before any recovered offset is
  * handed back — observed as a backward offset in the checkpoint log).
  * Each trigger admits at most `ratePerBatch` new ids, partitions split
  * the admitted range exactly like the batch scan, offsets serialize as
  * the plain id position — a restarted query resumes from its
  * checkpointed id with no duplication and no gaps. */
private class SyntheticMicroBatchStream(
    lo: Long, hi: Long, splits: Int, rate: Long, required: StructType)
  extends streaming.MicroBatchStream with streaming.SupportsTriggerAvailableNow {

  /** The id space is static (hi is fixed at table definition), so the
    * drain bound Trigger.AvailableNow seals at query start is just `hi` —
    * declaring the interface lets the engine drain in rate-limited
    * micro-batches instead of falling back to one unbounded batch. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  private case class IdOffset(pos: Long) extends streaming.Offset {
    override def json(): String = pos.toString
  }

  private def pos(o: streaming.Offset): Long = o match {
    case IdOffset(p) => p
    case other       => other.json().toLong
  }

  override def initialOffset(): streaming.Offset = IdOffset(lo)

  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(math.max(1L, rate))

  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val s = pos(start)
    // ReadAllAvailable is Trigger.Once/AvailableNow's drain-everything
    // contract — mapping it to the rate default would silently stop after
    // one batch. Composites take the tightest row cap their parts allow
    // (min across ReadMaxRows; an embedded all-available widens to hi).
    def admitted(l: streaming.ReadLimit): Long = l match {
      case _: streaming.ReadAllAvailable => hi - s
      case mr: streaming.ReadMaxRows     => mr.maxRows()
      case c: streaming.CompositeReadLimit =>
        // Only row-cap members constrain admission; ReadMinRows and
        // friends are hints this unbounded generator always satisfies.
        val caps = c.getReadLimits.toSeq.collect {
          case mr: streaming.ReadMaxRows     => mr.maxRows()
          case _: streaming.ReadAllAvailable => hi - s
        }
        if (caps.nonEmpty) caps.min else math.max(1L, rate)
      case _                             => math.max(1L, rate)
    }
    IdOffset(math.min(hi, s + math.max(0L, admitted(limit))))
  }

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def reportLatestOffset(): streaming.Offset = IdOffset(hi)

  override def deserializeOffset(json: String): streaming.Offset =
    IdOffset(json.toLong)

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] = {
    val (s, e) = (pos(start), pos(end))
    if (e <= s) Array.empty
    else {
      val per = math.max(1L, (e - s + splits - 1) / splits)
      (s until e by per)
        .map(p => SyntheticPartition(p, math.min(p + per, e)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition

private class SyntheticReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      // Column pruning made real: the row is assembled from per-column
      // generators selected ONCE per reader, not per row.
      private val gens: Array[Long => Any] = required.fields.map(_.name match {
        case "id"      => (id: Long) => id
        case "user_id" => (id: Long) => SyntheticEventsSource.userOf(id)
        case "kind"    => (id: Long) => UTF8String.fromString(SyntheticEventsSource.kindOf(id))
        case "value"   => (id: Long) => SyntheticEventsSource.valueOf(id)
      })
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(cur)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
