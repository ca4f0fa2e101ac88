package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a native `TypedImperativeAggregate`.
  *
  * The scale problem this solves: finding items with frequency > n/φ over
  * 100 TB with a plain `GROUP BY item` shuffles EVERY distinct key — at
  * billions of keys that is the whole dataset crossing the wire to learn
  * that almost all of them are light. This sketch keeps a bounded map of
  * `cap` counters per partial instance, merges associatively, and
  * guarantees (Misra–Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) that every item with true count
  * > n/(cap+1) survives with a positive lower-bound count. Only `cap`
  * entries per map task cross the single exchange regardless of input
  * size or key cardinality.
  *
  * The intended two-pass pattern (see `Udfs.qHeavyHitters`): pass 1 — this
  * sketch produces a candidate superset; pass 2 — a broadcast semi-join
  * restricts an exact recount to the candidates, and the final filter on
  * the EXACT count makes the result deterministic and oracle-equal to the
  * full GROUP BY, independent of sketch merge order.
  *
  * Implementation: the classic decrement-all step is amortized by letting
  * the map grow to `2·cap` and then compressing — subtract the
  * (size−cap)-th smallest count from every entry and drop the non-positive
  * ones (≤ cap survive). Each compression that subtracts `m` removes at
  * least `(cap+1)·m` total weight (the cap+1 surviving-or-equal entries
  * each lose the full `m`), so the total undercount of any single item is
  * ≤ n/(cap+1) — the same bound as per-element decrement, at O(1)
  * amortized map work per row instead of O(cap).
  *
  * Buffer is a raw binary `Array[Byte]` inside the unsafe aggregation
  * buffer (no Encoder boxing), so it is spill-safe under
  * ObjectHashAggregate fallback, like [[TopKPairs]].
  *
  * Reference anchor: the reference's engine-side role (SURVEY.md §2.3
  * north-star extensions) — no equivalent exists in the 645-LoC sink
  * (quasar-destination-h2 has no aggregate surface); this is engine
  * capability, cited per SURVEY.md §0.
  */
case class FrequentItems(
    item: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(item, capExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (item.dataType, capExpr.dataType) match {
      case (LongType, IntegerType) if capExpr.foldable =>
        capExpr.eval() match {
          case null => TypeCheckResult.TypeCheckFailure("graft_freq_items: cap must not be null")
          case i: Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure("graft_freq_items: cap must be positive")
        }
      case (it, ct) => TypeCheckResult.TypeCheckFailure(
        s"graft_freq_items requires (bigint item, foldable int cap), got ($it, $ct)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty

  /** Subtract the (size−cap)-th smallest count from every entry and drop
    * the non-positive ones, leaving ≤ cap entries. No-op if already small
    * enough. */
  private def compress(buf: mutable.LongMap[Long]): Unit = {
    val excess = buf.size - cap
    if (excess <= 0) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val m = counts(excess - 1) // (size-cap)-th smallest: ≥ excess entries reach ≤0
    val dead = mutable.ArrayBuffer.empty[Long]
    buf.foreachEntry { (k, v) =>
      if (v <= m) dead += k else buf.update(k, v - m)
    }
    dead.foreach(buf.remove)
  }

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
      if (buf.size >= 2 * cap) compress(buf)
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreachEntry { (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    compress(a)
    a
  }

  /** Emitted sorted (lb desc, item asc) for a deterministic array — though
    * consumers that need determinism should recount exactly (the lb values
    * themselves legitimately depend on partitioning). */
  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray
    java.util.Arrays.sort(entries, (x: (Long, Long), y: (Long, Long)) => {
      val c = java.lang.Long.compare(y._2, x._2)
      if (c != 0) c else java.lang.Long.compare(x._1, y._1)
    })
    new GenericArrayData(entries.map { case (k, v) => InternalRow(k, v) }.toArray[Any])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (k, v) => out.writeLong(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), capExpr = newChildren(1))
}
