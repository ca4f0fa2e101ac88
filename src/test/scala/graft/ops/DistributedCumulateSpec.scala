package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property tests for the two-level distributed prefix-sum kernel: on any
  * input, [[DistributedCumulate.runningTotals]] must equal the single
  * global window it replaces — rank and every running sum, row for row —
  * regardless of bucket count, input partitioning, value skew, or
  * negative values. The kernel's exactness argument (range partitioning
  * is key-total + offsets re-associate integer sums) is what these runs
  * exercise; the plan-shape side (no unpartitioned window) is pinned in
  * PlanShapeSpec. */
class DistributedCumulateSpec extends SparkTestBase {

  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("v").desc, col("id"))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("rk"), col("cum"))
  }

  private def kernel(df: org.apache.spark.sql.DataFrame, buckets: Int) =
    DistributedCumulate.runningTotals(df, buckets,
      Seq(col("v").desc, col("id")), Seq("x" -> "cum"), "rk")
      .select(col("id"), col("rk"), col("cum"))

  private def check(rows: Seq[(Long, Long, Long)], buckets: Int): Unit = {
    val df = rows.toDF("id", "v", "x")
    val got = kernel(df, buckets).orderBy("rk").collect().toSeq
    val want = reference(df).orderBy("rk").collect().toSeq
    assert(got === want, s"buckets=$buckets over ${rows.size} rows")
  }

  test("equals the global window on skewed data, any bucket count") {
    val rng = new scala.util.Random(42)
    // heavy ties in v (range partitioning must keep them together),
    // negative and positive x (offset re-association must stay exact)
    val rows = (1L to 500L).map { id =>
      (id, (rng.nextInt(7) - 3).toLong, (rng.nextInt(2001) - 1000).toLong)
    }
    Seq(1, 2, 3, 7, 32, 97).foreach(b => check(rows, b))
  }

  test("more buckets than rows, single row, empty input") {
    check(Seq((1L, 5L, 10L), (2L, 5L, -4L), (3L, 1L, 7L)), 64)
    check(Seq((1L, 0L, 0L)), 16)
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "v", "x")
    assert(kernel(empty, 8).count() === 0)
  }

  test("rank-only mode (no sums) matches row_number") {
    val rows = (1L to 200L).map(id => (id, id % 11, id * 3)).toDF("id", "v", "x")
    val got = DistributedCumulate.runningTotals(rows, 13,
        Seq(col("v"), col("id")), Nil, "rk")
      .select(col("id"), col("rk")).orderBy("rk").collect().toSeq
    val want = rows.withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("rk")).orderBy("rk").collect().toSeq
    assert(got === want)
  }
}
