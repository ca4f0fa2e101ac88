package graft.llm

import graft.SparkTestBase

/** The composed curation pipeline's contracts: the funnel is a real
  * funnel (each stage can only shrink the pool, output is non-trivial),
  * stage semantics hold on the output (no eval docs, valid shards), and
  * the composition discipline is pinned mechanically — the corpus text
  * is scanned once per KERNEL (all further access through the persisted
  * kernels), the budget stage runs the bucket cumulate, and nothing
  * plans a cartesian. Value-level correctness of the whole chain is the
  * driver's hash gate (`text_curation_pipeline` vs the chained-CTE
  * DuckDB oracle). */
class CurationPipelineSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def pipeline = Curation.curationPipeline(spark, sf)

  test("funnel: non-empty, strictly inside the corpus, no eval docs, valid shards") {
    val out = pipeline.collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.nonEmpty, "pipeline selected nothing")
    assert(out.length < total, "pipeline must be a proper funnel, not a pass-through")
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "duplicate doc_ids in the manifest")
    assert(ids.forall(_ % 97 != 0), "an eval/benchmark doc leaked into the training manifest")
    val shards = out.map(_.getAs[Long]("shard"))
    assert(shards.forall(s => s >= 0 && s < 8), s"shard out of range: ${shards.toSet}")
  }

  test("stage-boundary cuts change nothing: cut and uncut pipelines agree row for row") {
    // The checkpoint cuts exist for plan-size/latency only — the
    // dataflow must be value-identical with and without them (this is
    // the invariant that makes the cut an optimization rather than a
    // semantic; review-r14 replaced a vacuous sum>0 assertion with it).
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("est_tokens"), r.getAs[Long]("priority"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("shard"))
    val cut = pipeline.collect().map(key).sortBy(_._1)
    val uncut = Curation.curationPlan(spark, sf, identity)
      .collect().map(key).sortBy(_._1)
    assert(cut.toSeq === uncut.toSeq)
  }

  test("composition: documents scanned once per kernel — all access through persisted kernels") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // Inspect the UNCUT dataflow (identity stage boundary — the
    // production localCheckpoint cuts would hide the upstream stages
    // from the final plan): plan.collect does NOT descend into
    // InMemoryRelation's cached child plans, so any direct
    // FileSourceScan here is text access that BYPASSED the three
    // kernels. The kernels themselves each embed one scan, visible as
    // InMemoryTableScan references. (AdaptiveSparkPlan is a LEAF
    // wrapping the real tree — unwrap it first or collect sees
    // nothing.)
    val uncut = Curation.curationPlan(spark, sf, identity)
    val plan = uncut.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val direct = plan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(direct.isEmpty,
      s"corpus scanned outside the persisted kernels (${direct.size} direct scans):\n$plan")
    val imts = plan.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s
    }
    assert(imts.nonEmpty, s"expected kernel InMemoryTableScans in:\n$plan")
  }

  test("shapes: bucket cumulate for the budget stage, no cartesian anywhere") {
    val p = pipeline.queryExecution.executedPlan.toString
    assert(p.contains("graft_bottomk"),
      s"budget selection must run the DistributedCumulate bucket kernel:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no stage may plan a cartesian product:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the NB model / decon grams / mixture thresholds must broadcast:\n$p")
  }
}
