package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[WindowTopKRewrite]] — the injected optimizer rule that turns the
  * dead-rank ROW_NUMBER idiom into the bounded-heap TopKPerGroup plan.
  * Positive pin: Window vanishes. Negative pins: every guard that makes
  * the rewrite unsound must keep the Window. */
class WindowTopKRewriteSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val df =
    Seq((1, 10.0, 1L), (1, 30.0, 2L), (1, 20.0, 3L), (2, 5.0, 4L), (2, 7.0, 5L))
      .toDF("g", "score", "id")

  private val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")

  private def planOf(d: DataFrame): String = d.queryExecution.executedPlan.toString

  test("dead-rank row_number <= k rewrites to TopKPerGroup, Window eliminated") {
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2).drop("rn")
    val p = planOf(out)
    assert(p.contains("TopKPerGroup"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window"), s"Window survived the rewrite:\n$p")
    val got = out.orderBy($"g", $"score".desc, $"id").as[(Int, Double, Long)].collect().toSeq
    assert(got === Seq((1, 30.0, 2L), (1, 20.0, 3L), (2, 7.0, 5L), (2, 5.0, 4L)))
  }

  test("rn = 1 (argmax idiom) rewrites too") {
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    val p = planOf(out)
    assert(p.contains("TopKPerGroup") && !p.contains("Window"), p)
    assert(out.collect().length === 2)
  }

  test("extra rank-free conjuncts survive as a post-top-k filter") {
    val out = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2 && $"score" > 6.0).drop("rn")
    val p = planOf(out)
    assert(p.contains("TopKPerGroup") && !p.contains("Window"), p)
    val got = out.orderBy($"g", $"score".desc).as[(Int, Double, Long)].collect().toSeq
    assert(got === Seq((1, 30.0, 2L), (1, 20.0, 3L), (2, 7.0, 5L)))
  }

  test("NOT rewritten when the rank column is still referenced") {
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    val p = planOf(out)
    assert(p.contains("Window") && !p.contains("TopKPerGroup"),
      s"live rank must keep the Window:\n$p")
  }

  test("NOT rewritten for rank() — ties admit more than k rows") {
    val out = df.withColumn("rn", rank().over(w)).filter($"rn" <= 2).drop("rn")
    val p = planOf(out)
    assert(p.contains("Window") && !p.contains("TopKPerGroup"),
      s"rank() is not top-k-rows; must keep the Window:\n$p")
  }

  test("NOT rewritten without a partition spec (global top-k)") {
    val wg = Window.orderBy($"score".desc, $"id")
    val out = df.withColumn("rn", row_number().over(wg)).filter($"rn" <= 2).drop("rn")
    val p = planOf(out)
    assert(!p.contains("TopKPerGroup"), s"global window must not rewrite:\n$p")
  }

  test("spark.sql.optimizer.excludedRules disables the rewrite (TopKCompare relies on this)") {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "graft.plans.WindowTopKRewrite")
      val out = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2).drop("rn")
      val p = planOf(out)
      assert(p.contains("Window") && !p.contains("TopKPerGroup"),
        s"exclusion must keep the Window arm a Window:\n$p")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("rewritten query matches the un-rewritten Window result on real data") {
    val sf = "/root/testdata/sf0.001"
    val rewritten = PlanOps.queries("q_topk_window_rewrite")(spark, sf)
    val native = PlanOps.queries("q_topk_native_plan")(spark, sf)
    assert(rewritten.exceptAll(native).isEmpty && native.exceptAll(rewritten).isEmpty)
  }
}
