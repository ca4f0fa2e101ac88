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
}
