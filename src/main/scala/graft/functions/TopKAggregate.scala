package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k (score, payload) pairs as a native
  * `TypedImperativeAggregate` — the SCALE.md upgrade path for top-k when
  * the group count is huge and the query side is NOT broadcastable (e.g.
  * per-document kNN over a full corpus): constant-size per-group state,
  * associative partial merge on every map task, and a RAW BINARY buffer
  * (`serialize`/`deserialize` to `Array[Byte]`) that lives inside the
  * unsafe aggregation buffer — no Encoder boxing per row like a `udaf`,
  * and spill-safe under hash-aggregate fallback.
  *
  * Ordering is total and deterministic: score descending, then payload
  * ascending — so results are reproducible under any partitioning and
  * merge order (the same tie rule the oracle's ROW_NUMBER uses).
  *
  * Ladder position (SURVEY.md §7.3): above the typed `Aggregator` demo
  * ([[Udfs.TopK]] — Encoder-based, fine at moderate group counts), below
  * a custom physical operator (unneeded: hash-aggregate machinery is
  * already right, only the per-group state is custom).
  */
case class TopKPairs(
    score: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, payload, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, payload.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType) if kExpr.foldable =>
        kExpr.eval() match {
          case null => TypeCheckResult.TypeCheckFailure("graft_topk: k must not be null")
          case i: Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure("graft_topk: k must be positive")
        }
      case (s, p, kt) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint, foldable int k), got ($s, $p, $kt)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  // Total order: better = higher score, then lower payload. Double.compare
  // (not the > / == primitives, which make NaN unordered) so NaN sorts as
  // GREATEST — the same rule Spark's ORDER BY ... DESC and DuckDB apply,
  // keeping this aggregate interchangeable with the ROW_NUMBER formulation
  // even on NaN scores (reachable as 0/0 cosine of a zero vector).
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  /** O(1) reject when full and not beating the current worst;
    * O(log k) sift otherwise. The buffer is a BINARY MIN-HEAP on
    * "goodness" — `buf(0)` is the worst retained pair, the eviction
    * candidate — not a sorted array: a sorted-splice insert is O(k) per
    * accepted row, which at sketch-scale k (2048 in the quantile sketch)
    * made buffer buildup O(k²) per group per task (measured 3.6 s at
    * sf0.1, the most expensive query in the suite). Order is imposed once,
    * at [[eval]]. */
  private def worseEq(a: (Double, Long), b: (Double, Long)): Boolean = !beats(a, b)

  private def siftUp(buf: ArrayBuffer[(Double, Long)], i0: Int): Unit = {
    var i = i0
    while (i > 0 && worseEq(buf(i), buf((i - 1) / 2))) {
      val p = (i - 1) / 2
      val t = buf(i); buf(i) = buf(p); buf(p) = t
      i = p
    }
  }

  private def siftDown(buf: ArrayBuffer[(Double, Long)], i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of the worst among parent and children
      if (l < buf.length && worseEq(buf(l), buf(w))) w = l
      if (r < buf.length && worseEq(buf(r), buf(w))) w = r
      if (w == i) done = true
      else {
        val t = buf(i); buf(i) = buf(w); buf(w) = t
        i = w
      }
    }
  }

  private def heapify(buf: ArrayBuffer[(Double, Long)]): Unit = {
    var i = buf.length / 2 - 1
    while (i >= 0) { siftDown(buf, i); i -= 1 }
  }

  private def insert(buf: ArrayBuffer[(Double, Long)], v: (Double, Long)): Unit = {
    if (buf.length < k) {
      buf += v
      siftUp(buf, buf.length - 1)
    } else if (beats(v, buf(0))) {
      buf(0) = v
      siftDown(buf, 0)
    }
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null)
      insert(buf, (s.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.toArray.sortWith(beats).map(p => InternalRow(p._1, p._2): Any))

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    // Restore the heap invariant: the wire format carries no order (and a
    // pre-heap checkpoint from an older binary carried best-first order —
    // heapify accepts both).
    heapify(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}
