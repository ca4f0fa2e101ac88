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

  test("equality holds with exchange reuse disabled (two-subtree hazard)") {
    // `local` and `totals` both consume the range exchange; correctness
    // must not silently depend on ReuseExchange unifying them — with a
    // deterministic input, re-evaluation re-derives identical buckets.
    val rows = (1L to 300L).map(id => (id, id % 5, (id % 13) - 6))
    val prev = spark.conf.get("spark.sql.exchange.reuse")
    try {
      spark.conf.set("spark.sql.exchange.reuse", "false")
      check(rows, 16)
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
  }

  test("exactDiscCuts is bit-identical to percentile_disc on edge fixtures") {
    // Fixtures chosen to hit the boundary cases of the disc rule
    // (smallest value whose cumulative distribution reaches q): heavy
    // ties, q·n exactly integral, double-q terciles that are NOT exact
    // thirds, n=1, q=1.0, negative values.
    val qsets: Seq[Seq[Double]] = Seq(
      (1 to 9).map(i => s"0.$i".toDouble),
      Seq(0.25, 0.5, 0.75),
      Seq(0.3333333333333333, 0.6666666666666666),
      Seq(0.01, 0.99, 1.0))
    val fixtures: Seq[Seq[Double]] = Seq(
      (1 to 10).map(_.toDouble),                      // q·n integral at deciles
      (1 to 7).map(_.toDouble),                       // prime n
      Seq(5.0),                                       // single row
      Seq(1.0, 1.0, 1.0, 2.0),                        // ties across a cutpoint
      (1 to 12).map(i => (i % 3).toDouble),           // 3 distinct values, 12 rows
      (1 to 100).map(i => (i % 10).toDouble - 4.5),   // negatives, dense ties
      (1 to 30).map(i => math.floor(i / 7.0)))        // skewed run lengths
    for (vals <- fixtures; qs <- qsets) {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val named = qs.zipWithIndex.map { case (q, i) => q -> s"c$i" }
      val got = DistributedCumulate.exactDiscCuts(df, "v", named, 4).collect()(0)
      df.createOrReplaceTempView("graft_cuts_fixture")
      val sql = qs.zipWithIndex.map { case (q, i) =>
        s"percentile_disc($q) WITHIN GROUP (ORDER BY v) AS c$i"
      }.mkString(", ")
      val want = spark.sql(s"SELECT $sql FROM graft_cuts_fixture").collect()(0)
      assert(got === want, s"vals=$vals qs=$qs")
    }
  }

  test("exactDiscCutsGrouped matches per-group percentile_disc") {
    // Groups of different sizes/shapes, incl. a single-row group and a
    // heavy-tie group; every (group, q) cell must equal the builtin.
    val rows =
      (1 to 10).map(i => (0, i.toLong)) ++
      Seq((1, 7L)) ++
      (1 to 12).map(i => (2, (i % 3).toLong)) ++
      (1 to 30).map(i => (3, (i % 7).toLong - 3))
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75")
    val got = DistributedCumulate
      .exactDiscCutsGrouped(df, "g", "v", qs, 4, 4)
      .orderBy("g").collect().toSeq
    df.createOrReplaceTempView("graft_gcuts_fixture")
    val want = spark.sql(
      """SELECT g,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS q25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS q50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS q75
        |FROM graft_gcuts_fixture GROUP BY g ORDER BY g""".stripMargin)
      .collect().toSeq
    assert(got === want)
  }

  test("exactContCuts is bit-identical to percentile() on interpolating fixtures") {
    // Interpolation arithmetic ((higher−pos)·lo + (pos−lower)·hi, with
    // the builtin's two short-circuits) must agree to the last ulp —
    // fixtures force fractional positions, equal bracketing values,
    // q=0/1 extremes, and non-representable weighted sums.
    val qsets: Seq[Seq[Double]] = Seq(
      Seq(0.5, 0.9), Seq(0.0, 1.0), Seq(0.25, 0.75),
      Seq(0.3333333333333333, 0.1), Seq(0.37, 0.63))
    val fixtures: Seq[Seq[Double]] = Seq(
      (1 to 10).map(_.toDouble),
      (1 to 7).map(_.toDouble),
      Seq(5.0),
      Seq(0.1, 0.1, 0.1, 0.2),                       // equal-bracket short-circuit
      (1 to 12).map(i => (i % 3) * 0.1),             // ties, non-representable sums
      (1 to 100).map(i => ((i % 10) - 4.5) * 0.7),
      (1 to 9).map(i => math.pow(1.3, i)))
    for (vals <- fixtures; qs <- qsets) {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val named = qs.zipWithIndex.map { case (q, i) => q -> s"c$i" }
      val got = DistributedCumulate.exactContCuts(df, "v", named, 4).collect()(0)
      val want = df.agg(
        expr(s"percentile(v, ${qs.head})").as("c0"),
        qs.tail.zipWithIndex.map { case (q, i) =>
          expr(s"percentile(v, $q)").as(s"c${i + 1}") }: _*).collect()(0)
      (0 until qs.length).foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(got.getDouble(i)) ===
          java.lang.Double.doubleToRawLongBits(want.getDouble(i)),
          s"vals=$vals q=${qs(i)}: got=${got.getDouble(i)} want=${want.getDouble(i)}")
      }
    }
  }

  test("exactDiscCuts preserves the value type and drops nulls") {
    val df = Seq[(Long, java.lang.Long)]((1L, 10L), (2L, 20L), (3L, null),
      (4L, 30L), (5L, 40L)).toDF("id", "v")
    val out = DistributedCumulate.exactDiscCuts(df, "v",
      Seq(0.5 -> "med", 1.0 -> "hi"), 3)
    assert(out.schema("med").dataType === org.apache.spark.sql.types.LongType)
    val r = out.collect()(0)
    assert(r.getLong(0) === 20L && r.getLong(1) === 40L)
  }

  test("runningMaxExclusive equals the exclusive-frame global window") {
    val refMax = (df: org.apache.spark.sql.DataFrame) => {
      val w = Window.orderBy(col("id"))
      df.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("wm", max(col("x")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("id"), col("rk"), col("wm"))
    }
    val kernelMax = (df: org.apache.spark.sql.DataFrame, b: Int) =>
      DistributedCumulate.runningMaxExclusive(df, b,
        Seq(col("id")), Seq("x" -> "wm"), "rk")
        .select(col("id"), col("rk"), col("wm"))
    val rng = new scala.util.Random(7)
    // monotone-ish with bursts of out-of-order drops: the exclusive max
    // must stay null ONLY on the global first row, and bucket-boundary
    // rows must see earlier buckets' maxima through the offset join.
    val rows = (1L to 400L).map(id => (id, 0L, id * 3 + rng.nextInt(50) - 25))
    Seq(1, 2, 5, 32, 97).foreach { b =>
      val df = rows.toDF("id", "v", "x")
      val got = kernelMax(df, b).orderBy("rk").collect().toSeq
      val want = refMax(df).orderBy("rk").collect().toSeq
      assert(got === want, s"buckets=$b")
      assert(got.head.isNullAt(2), "global first row must have null watermark")
    }
    // descending values: every row after the first is dominated by row 1.
    val desc = (1L to 50L).map(id => (id, 0L, 1000L - id)).toDF("id", "v", "x")
    val g = kernelMax(desc, 8).orderBy("rk").collect().toSeq
    assert(g.tail.forall(_.getLong(2) === 999L))
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
