package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.VectorFunctions.dotp

/** DotProduct expression: interpreted + codegen paths, null handling, and
  * bit-parity with the composable zip_with/aggregate formulation. */
class VectorExpressionsSpec extends SparkTestBase {

  private def zipDot = {
    import org.apache.spark.sql.Column
    (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  test("dot product matches zip_with fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val out = df.select(dotp(col("a"), col("b")).as("d"), zipDot(col("a"), col("b")).as("z"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(out(0).getDouble(0) == 32.0)
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(dotp(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("runs inside whole-stage codegen over many rows") {
    import spark.implicits._
    val n = 10000
    val df = spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(63)), i => (i + col("id")).cast("double")).as("v"))
    val total = df.select(sum(dotp(col("v"), col("v"))).as("s")).collect().head.getDouble(0)
    assert(total > 0)
    // spot-check one row: sum_{i=0..63} (i+7)^2
    val row7 = df.filter(col("id") === 7).select(dotp(col("v"), col("v"))).collect().head.getDouble(0)
    assert(row7 == (0 until 64).map(i => math.pow(i + 7, 2)).sum)
  }

  test("graft_topk keeps top-k under any partitioning (partial-merge determinism)") {
    import spark.implicits._
    // scores collide on purpose: payload-asc tie-break must hold.
    val rows = (1L to 1000L).map(i => (i % 7, (i % 13).toDouble, i))
    def run(parts: Int) =
      rows.toDF("g", "s", "p").repartition(parts)
        .groupBy(col("g"))
        .agg(call_function("graft_topk", col("s"), col("p"), lit(5)).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "x")))
        .select(col("g"), col("pos"), col("x.score"), col("x.payload"))
        .orderBy(col("g"), col("pos"))
        .collect().toSeq
    val a = run(1)
    val b = run(17)
    assert(a == b)
    // expected winners for group 0: score 12.0 first, smallest payloads
    val g0 = a.filter(_.getLong(0) == 0L).map(r => (r.getDouble(2), r.getLong(3)))
    val expect = rows.filter(_._1 == 0).map(t => (t._2, t._3))
      .sortBy { case (s, p) => (-s, p) }.take(5)
    assert(g0 == expect)
  }

  test("graft_topk ranks NaN scores greatest, matching ORDER BY ... DESC") {
    import spark.implicits._
    val df = Seq((1L, Double.NaN, 10L), (1L, 5.0, 11L), (1L, 7.0, 12L)).toDF("g", "s", "p")
    val out = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("p"), lit(2)).as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "x")))
      .select(col("x.payload")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(10L, 12L)) // NaN sorts first (greatest), then 7.0
  }

  test("graft_topk serialize/deserialize round-trips the buffer") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val agg = TopKPairs(Literal(0.0), Literal(0L), Literal(3))
    val buf = scala.collection.mutable.ArrayBuffer((3.5, 10L), (2.5, 11L), (2.5, 12L))
    // The wire format carries the PAIRS, not their order (the buffer is a
    // heap internally); eval imposes the total order, so roundtrip is
    // judged on the evaluated result.
    val roundtripped = agg.deserialize(agg.serialize(buf))
    assert(roundtripped.sorted == buf.sorted)
    assert(agg.eval(roundtripped).asInstanceOf[GenericArrayData].array.toSeq
      == Seq(InternalRow(3.5, 10L), InternalRow(2.5, 11L), InternalRow(2.5, 12L)))
    assert(agg.deserialize(agg.serialize(scala.collection.mutable.ArrayBuffer.empty)).isEmpty)
  }

  test("graft_topk rejects non-positive k at analysis") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 1L)).toDF("g", "s", "p")
    intercept[Exception] {
      df.groupBy(col("g"))
        .agg(call_function("graft_topk", col("s"), col("p"), lit(0)).as("t"))
        .collect()
    }
  }
}
