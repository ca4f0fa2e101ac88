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

  test("semDedup: keep-first invariant, non-vacuous, cluster-bounded pruning") {
    val out = Similarity.semDedup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    // Non-vacuity: the corpus plants near-duplicates, some must prune.
    assert(out.exists(_._3), "no vector pruned — threshold or clustering is vacuous")
    assert(out.count(_._3) < out.length / 2, "pruning most of the corpus is a bug")
    // Keep-first: the smallest vec_id of every cluster can never be
    // pruned (its only candidates have larger ids by construction).
    out.groupBy(_._2).values.foreach { cell =>
      val first = cell.minBy(_._1)
      assert(!first._3, s"cluster-min vec ${first._1} must survive")
    }
  }

  test("pcaPower: unit norm, and the Rayleigh quotient beats a random direction") {
    val sf = "/root/testdata/sf0.001"
    val v = Similarity.pcaPower(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    assert(v.length == 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4, "loadings are unit-norm")
    // Driver-side recomputation of the quantized second-moment matrix.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(f =>
        math.floor(f.toDouble * 1e6 + 0.5)))
    val d = 64
    val S = Array.ofDim[Double](d, d)
    emb.foreach { q =>
      var i = 0
      while (i < d) { var j = 0; while (j < d) { S(i)(j) += q(i) * q(j) / 1e12; j += 1 }; i += 1 }
    }
    def rayleigh(x: Array[Double]): Double = {
      val sx = Array.tabulate(d)(i => (0 until d).map(j => S(i)(j) * x(j)).sum)
      (0 until d).map(i => x(i) * sx(i)).sum
    }
    // The power method's guarantee: each step's Rayleigh quotient is
    // non-decreasing; six steps must strictly beat the isotropic start
    // (trace/d — what a random direction scores in expectation).
    val traceOverD = (0 until d).map(i => S(i)(i)).sum / d
    val r6 = rayleigh(v)
    assert(r6 > traceOverD * 1.5,
      s"power iteration made no progress: rayleigh $r6 vs trace/d $traceOverD")
    var x = Array.fill(d)(0.125)
    var prev = rayleigh(x)
    (1 to 6).foreach { _ =>
      val sx = Array.tabulate(d)(i => (0 until d).map(j => S(i)(j) * x(j)).sum)
      val nm = math.sqrt(sx.map(t => t * t).sum)
      x = sx.map(_ / nm)
      val r = rayleigh(x)
      assert(r >= prev - 1e-9, "Rayleigh quotient must be monotone under power steps")
      prev = r
    }
    // The distributed vector IS the driver-side power-iteration result.
    assert(v.zip(x).forall { case (a, b) => math.abs(a - b) < 1e-4 })
  }
}
