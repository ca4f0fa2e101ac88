package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structural + plan pins for PQ encode / ADC search / re-rank. */
class ProductQuantizationSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("encode: one row per vector, all 8 codes in [0,4)") {
    val enc = ProductQuantization.queries("vec_pq_encode")(spark, sf).cache()
    assert(enc.count() === 500)
    val codeCols = (0 until 8).map(s => col(s"code_$s"))
    val bad = enc.filter(codeCols.map(c => c < 0 || c >= 4).reduce(_ || _)).count()
    assert(bad === 0)
    enc.unpersist()
  }

  test("encode plan: map-only scan-fused codegen — no hash shuffle, no UDF") {
    val df = ProductQuantization.queries("vec_pq_encode")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"encode must not shuffle (only the final sort may range-partition):\n$p")
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"expected codegen span (the *(n) marker) in:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"expected pure expressions in:\n$p")
  }

  test("adc top-k plan: bounded TakeOrderedAndProject, codes-only projection") {
    val p = ProductQuantization.queries("vec_pq_adc_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must be the bounded operator, not sort+limit stages:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"ADC scan must be map-only:\n$p")
  }

  test("rerank: exact distances ascending, ids drawn from the ADC top-50 shortlist") {
    val rr = ProductQuantization.queries("vec_pq_rerank")(spark, sf)
      .as[(Long, Double)].collect()
    assert(rr.length === 10)
    assert(rr.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "exact_dist not ascending")
    val shortlist = ProductQuantization.adcShortlist(spark, sf, 50)
      .select($"vec_id").as[Long].collect().toSet
    assert(shortlist.size === 50)
    val outside = rr.map(_._1).filterNot(shortlist.contains)
    assert(outside.isEmpty, s"reranked ids not in the ADC shortlist: $outside")
  }

  test("rerank plan: shortlist joins back via broadcast, not a shuffle of vectors") {
    val p = ProductQuantization.queries("vec_pq_rerank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bounded shortlist must broadcast:\n$p")
  }

  test("encode is deterministic across runs and partitionings") {
    val a = ProductQuantization.queries("vec_pq_encode")(spark, sf).collect()
    val b = ProductQuantization.queries("vec_pq_encode")(spark, sf).collect()
    assert(a.sameElements(b))
  }
}
