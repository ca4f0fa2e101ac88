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

  /** O(1) reject when full and not beating the current minimum; O(k)
    * bounded splice otherwise. Buffer is kept sorted best-first. */
  private def insert(buf: ArrayBuffer[(Double, Long)], v: (Double, Long)): Unit = {
    if (buf.length >= k && !beats(v, buf.last)) ()
    else {
      var i = 0
      while (i < buf.length && !beats(v, buf(i))) i += 1
      buf.insert(i, v)
      if (buf.length > k) buf.remove(buf.length - 1)
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
    new GenericArrayData(buf.map(p => InternalRow(p._1, p._2)).toArray[Any])

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
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}
