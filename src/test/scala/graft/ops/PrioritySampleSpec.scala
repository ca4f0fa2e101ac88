package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Priority sampling (q_weighted_sample): the statistical contract behind
  * the oracle-gated sample — weight-proportional inclusion and the
  * Duffield–Lund–Thorup threshold estimator for subset sums. */
class PrioritySampleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("DLT threshold estimator recovers the population total within 10%") {
    // ŵ_i = max(w_i, τ) over the top-k sample, τ = (k+1)-th priority, is
    // an unbiased estimator of Σw with near-optimal variance. One
    // deterministic draw over ~15k orders at k=100 should land well
    // inside ±10% (relative std ≈ 1/√k = 10%, and the heavy tail is
    // sampled with probability → 1).
    val k = 100
    val M = 2147483647L
    val u = ((col("o_orderkey") * 2654435761L) % M + 1L).cast("double") / M.toDouble
    val scored = graft.sources.Tables(spark, dir).orders
      .select(col("o_totalprice").as("w"), (col("o_totalprice") / u).as("priority"))
    val top = scored.orderBy(desc("priority")).limit(k + 1)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val tau = top.last._2
    val estimate = top.take(k).map { case (w, _) => math.max(w, tau) }.sum
    val trueTotal = scored.agg(sum(col("w"))).head().getDouble(0)
    val relErr = math.abs(estimate - trueTotal) / trueTotal
    assert(relErr < 0.10,
      f"DLT estimate $estimate%.0f vs true $trueTotal%.0f — rel err $relErr%.3f ≥ 10%%")
  }

  test("inclusion is weight-monotone: the sample's mean weight dominates the population's") {
    val sample = graft.SparkEntry.queries("q_weighted_sample")(spark, dir)
    val meanSampled = sample.agg(avg(col("o_totalprice"))).head().getDouble(0)
    val meanAll = graft.sources.Tables(spark, dir).orders
      .agg(avg(col("o_totalprice"))).head().getDouble(0)
    assert(meanSampled > meanAll,
      s"weighted sample mean $meanSampled should exceed population mean $meanAll")
  }
}
