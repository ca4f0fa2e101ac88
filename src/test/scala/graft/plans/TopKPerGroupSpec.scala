package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator path: logical node → injected strategy →
  * physical operator. Correctness is pinned against the Window
  * formulation it replaces; the plan is pinned to contain the custom
  * operator and NO Window/Sort (the whole point: no full partition sort). */
class TopKPerGroupSpec extends SparkTestBase {

  // 10k rows, 23 groups, deliberate score ties (v has only 40 values).
  private def data = {
    spark.range(10000).select(
      (col("id") % 23).as("g"),
      (col("id") % 40).cast("double").as("v"),
      col("id").as("uid"))
  }

  private def viaCustom(parts: Int) =
    TopKPerGroup(data.repartition(parts), Seq("g"), Seq(("v", false), ("uid", true)), 5)
      .orderBy(col("g"), col("v").desc, col("uid"))
      .collect().toSeq

  test("matches the window row_number formulation, under any partitioning") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("uid"))
    val expected = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy(col("g"), col("v").desc, col("uid"))
      .collect().toSeq
    assert(viaCustom(1) == expected)
    assert(viaCustom(13) == expected)
  }

  test("groups smaller than k keep all their rows") {
    import spark.implicits._
    val tiny = Seq((1L, 1.0, 1L), (1L, 2.0, 2L), (2L, 9.0, 3L)).toDF("g", "v", "uid")
    val out = TopKPerGroup(tiny, Seq("g"), Seq(("v", false), ("uid", true)), 5)
      .orderBy(col("g"), col("v").desc).collect()
    assert(out.length == 3)
  }

  test("plans as the custom operator with one exchange and no Window/Sort") {
    val p = TopKPerGroup(data, Seq("g"), Seq(("v", false), ("uid", true)), 5)
      .queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix in plan strings. Two instances:
    // the map-side partial below the exchange and the final above it.
    assert("TopKPerGroup".r.findAllIn(p).size == 2,
      s"expected partial+final custom operators in plan:\n$p")
    assert(!p.contains("Window"), s"window leaked into custom-op plan:\n$p")
    assert(!p.contains("Sort"), s"full sort defeats the bounded-heap design:\n$p")
    assert(p.contains("Exchange"), s"expected hash exchange on the group key:\n$p")
  }

  test("fallback: tiny threshold forces flush-and-reset + sort-based emit, same result") {
    // Threshold of 7 buffered rows: with 23 groups × k=5 (≤115 held rows
    // per partition) EVERY partition overflows — the partial instances
    // flush multiple chunks and the final instances all take the
    // sort-based path. Output must be bit-identical to the hash path.
    val expected = viaCustom(13)
    spark.conf.set(TopKPerGroupExec.FallbackRowsKey, "7")
    try {
      assert(viaCustom(13) == expected)
      assert(viaCustom(1) == expected)
    } finally spark.conf.unset(TopKPerGroupExec.FallbackRowsKey)
  }

  test("fallback survives a skewed group mixed with many small groups") {
    // One giant group (id%2=0 half the rows) plus high-cardinality groups:
    // exercises group-run emission where a run is far longer than k.
    val skewed = spark.range(20000).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 501).as("g"),
      (col("id") % 97).cast("double").as("v"),
      col("id").as("uid"))
    def run() = TopKPerGroup(skewed.repartition(7), Seq("g"),
        Seq(("v", false), ("uid", true)), 3)
      .orderBy(col("g"), col("v").desc, col("uid")).collect().toSeq
    val expected = run()
    spark.conf.set(TopKPerGroupExec.FallbackRowsKey, "16")
    try assert(run() == expected)
    finally spark.conf.unset(TopKPerGroupExec.FallbackRowsKey)
  }

  test("zero/negative fallback threshold clamps to 1 instead of spinning a task") {
    // Regression: hashChunk(cap=0) consumed no input while iter.hasNext
    // stayed true — the partial instance's hasNext loop spun forever.
    // Clamped to 1, every row becomes its own chunk: slow, but correct
    // and terminating.
    val expected = viaCustom(4)
    for (bad <- Seq("0", "-5")) {
      spark.conf.set(TopKPerGroupExec.FallbackRowsKey, bad)
      try assert(viaCustom(4) == expected, s"threshold=$bad")
      finally spark.conf.unset(TopKPerGroupExec.FallbackRowsKey)
    }
  }

  test("string + composite group keys: variable-length rows in hash and fallback paths") {
    // Every existing fixture groups on fixed-width keys; string keys make
    // the UnsafeRow variable-length, exercising byte-equality grouping,
    // heap copying, and the sort fallback's run detection on non-scalar
    // layouts. Composite (string, long) keys also cover multi-expr
    // grouping. Pinned against the Window formulation, both paths.
    val d = spark.range(2000).select(
      concat(lit("grp_"), (col("id") % 7).cast("string")).as("g1"),
      (col("id") % 3).as("g2"),
      (col("id") % 40).cast("double").as("v"),
      col("id").as("uid"))
    val w = Window.partitionBy(col("g1"), col("g2")).orderBy(col("v").desc, col("uid"))
    val expected = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .orderBy(col("g1"), col("g2"), col("v").desc, col("uid")).collect().toSeq
    def run() = TopKPerGroup(d.repartition(9), Seq("g1", "g2"),
        Seq(("v", false), ("uid", true)), 4)
      .orderBy(col("g1"), col("g2"), col("v").desc, col("uid")).collect().toSeq
    assert(run() == expected, "hash path diverged on string keys")
    spark.conf.set(TopKPerGroupExec.FallbackRowsKey, "11")
    try assert(run() == expected, "fallback path diverged on string keys")
    finally spark.conf.unset(TopKPerGroupExec.FallbackRowsKey)
  }

  test("float group keys: -0.0/0.0 and NaN group identically in hash and sort paths") {
    // Regression for the planning-time NormalizeNaNAndZero wrap: the hash
    // phase groups by UnsafeRow bytes (-0.0 != 0.0, NaN patterns differ),
    // the sort fallback by ordering (-0.0 == 0.0) — unnormalized, the
    // result depended on which path ran.
    import spark.implicits._
    val nan1 = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val nan2 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)  // distinct bits
    val rows = Seq((0.0, 1.0, 1L), (-0.0, 2.0, 2L), (-0.0, 3.0, 3L),
                   (nan1, 4.0, 4L), (nan2, 5.0, 5L)).toDF("g", "v", "uid")
    def run() = TopKPerGroup(rows.repartition(3), Seq("g"), Seq(("v", false), ("uid", true)), 2)
      .orderBy(col("v")).collect().map(_.getLong(2)).toSeq
    // ±0.0 is ONE group (top-2 of v: uid 2,3) and NaN is ONE group
    // (top-2: uid 4,5) — so uid 1 is the only row cut.
    val hashPath = run()
    assert(hashPath == Seq(2L, 3L, 4L, 5L), s"got $hashPath")
    spark.conf.set(TopKPerGroupExec.FallbackRowsKey, "1")   // force sort path
    try assert(run() == hashPath)
    finally spark.conf.unset(TopKPerGroupExec.FallbackRowsKey)
  }

  test("unknown column and bad k fail fast") {
    intercept[IllegalArgumentException] {
      TopKPerGroup(data, Seq("nope"), Seq(("v", false)), 3)
    }
    intercept[IllegalArgumentException] {
      TopKPerGroup(data, Seq("g"), Seq(("v", false)), 0)
    }
  }
}
