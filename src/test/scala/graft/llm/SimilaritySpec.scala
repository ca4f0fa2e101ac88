package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit pins for the similarity kernels that the oracle can't reach:
  * DuckDB and Spark disagree on NaN ordering conventions, so NaN-bearing
  * inputs never appear in the oracle-gated queries — but a zero-norm
  * embedding (all-zero vector) produces a NaN cosine at runtime, and the
  * selection and ranking steps must agree on where it lands. */
class SimilaritySpec extends SparkTestBase {

  test("topKRanked: NaN cosine ranks exactly where the heap selected it") {
    import spark.implicits._
    // Spark's ordering puts NaN greatest → under (cos DESC, id ASC) the
    // heap selects the NaN row FIRST. The rank derivation must replay
    // that: the regression was an ascending sort on -cos, where -NaN is
    // still NaN = greatest = LAST ascending — rank flipped to k.
    val scored = Seq(
      (1L, 10L, Double.NaN),
      (1L, 11L, 0.9),
      (1L, 12L, 0.8),
      (1L, 13L, 0.7),
      (2L, 11L, 0.5),
      (2L, 10L, 0.5)          // tie on cos → neighbor_id ASC breaks it
    ).toDF("query_id", "neighbor_id", "cos")
    val out = Similarity.topKRanked(scored, 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, 10L),   // NaN first under DESC, and ranked first too
      (1L, 2L, 11L),
      (1L, 3L, 12L),
      (2L, 1L, 10L),   // cos tie broken by neighbor_id ascending
      (2L, 2L, 11L)))
    // The NaN survives into the emitted score column (not silently zeroed).
    val nanRow = Similarity.topKRanked(scored, 3)
      .filter(col("query_id") === 1 && col("rank") === 1).collect().head
    assert(nanRow.getDouble(nanRow.fieldIndex("cos_sim")).isNaN)
  }

  test("trained multiprobe recall DOMINATES nprobe=1 on the eval fixture") {
    // The point of knn_ivf_trained_multiprobe: the second probed cell can
    // only ADD candidates, so per-query recall must never drop — and on
    // this fixture it must strictly improve somewhere, or the operator
    // buys nothing (knn_recall_eval_trained is the oracle-gated scorer;
    // this pins the dominance claim its Scaladoc makes).
    val rows = Similarity.knnRecallEvalTrained(spark, "/root/testdata/sf0.001")
      .select(col("query_id"), col("hits_p1"), col("hits_p2"))
      .collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"query ${r.getLong(0)}: nprobe=2 recall dropped below nprobe=1")
    }
    assert(rows.map(_.getLong(2)).sum > rows.map(_.getLong(1)).sum,
      "nprobe=2 must strictly improve aggregate recall on this fixture")
  }
}
