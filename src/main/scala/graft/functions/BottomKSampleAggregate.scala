package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** DETERMINISTIC uniform sample as a native `TypedImperativeAggregate`:
  * keeps the K input rows with the smallest `(splitmix64(bits(v)), v)`
  * pair — a bottom-K-by-hash sketch (the classic KMV/bottom-k sampling
  * scheme; see Cohen & Kaplan, "Summarizing data using bottom-k
  * sketches", PODC 2007). Because "the K smallest by a total order" is a
  * pure multiset function of the input, the result is IDENTICAL no
  * matter how partials are split, merged, or ordered — unlike
  * `approx_percentile`, whose GK-summary merge is order-sensitive and
  * therefore run-to-run nondeterministic in the last ulp.
  *
  * That determinism is the point: [[graft.ops.DistributedCumulate]]
  * derives its range-bucket BOUNDARIES from this sample, and the bucket
  * assignment must be a pure function of the data so that independent
  * subtrees of one plan (local windows, per-bucket totals) can never
  * disagree on a row's bucket — regardless of exchange-reuse settings or
  * re-evaluation. It also replaces `repartitionByRange`'s boundary
  * sampling pass, which re-executes the child plan a second time (the
  * RangePartitioner samples the child RDD before the shuffle writes it).
  *
  * Each partial holds ≤ 2K `(hash, value)` pairs (shrunk to K by a sort
  * when full — O(log K) amortized per row), only K pairs per map task
  * cross the exchange, and `eval` returns the sampled VALUES sorted
  * ascending. A hash collision at the K boundary ties on the value
  * itself, so truncation is still deterministic. Nulls are skipped.
  *
  * Reference anchor: engine capability (SURVEY.md §2.3 north-star
  * extensions) — the reference's 645-LoC sink has no aggregate surface.
  */
case class BottomKSample(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Double)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (DoubleType, IntegerType) if kExpr.foldable =>
        kExpr.eval() match {
          case null => TypeCheckResult.TypeCheckFailure("graft_bottomk: k must not be null")
          case i: Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure("graft_bottomk: k must be positive")
        }
      case (ct, kt) => TypeCheckResult.TypeCheckFailure(
        s"graft_bottomk requires (double value, foldable int k), got ($ct, $kt)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  // splitmix64 finalizer — a fixed, JVM-independent mix of the value's
  // IEEE bit pattern; the sample is a pure function of the data.
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val ord: Ordering[(Long, Double)] = Ordering.Tuple2[Long, Double]

  private def shrink(buf: mutable.ArrayBuffer[(Long, Double)]): Unit =
    if (buf.length > k) {
      buf.sortInPlace()(ord)
      buf.remove(k, buf.length - k)
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Double)] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[(Long, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Double)] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      buf += ((mix(java.lang.Double.doubleToLongBits(d)), d))
      if (buf.length >= 2 * k) shrink(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Long, Double)],
      other: mutable.ArrayBuffer[(Long, Double)]): mutable.ArrayBuffer[(Long, Double)] = {
    buf ++= other
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Double)]): Any = {
    shrink(buf)
    new GenericArrayData(buf.map(_._2).toArray.sorted)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (h, d) => out.writeLong(h); out.writeDouble(d) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[(Long, Double)](n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "graft_bottomk"
}
