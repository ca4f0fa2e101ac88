package graft.llm

import graft.SparkTestBase
import graft.sources.Tables

/** Pins the round-18 adjudication that re-homed `embedding_near_dup_lsh`
  * onto cell blocking (verdict-r18 #1): at a LOW cosine threshold
  * (0.45) sign-random-projection LSH does not block — per-bit collision
  * for a true pair is 1 − acos(0.45)/π ≈ 0.65 vs 0.5 for a random pair,
  * so the 8×4-bit geometry admits ≈ n²/16 candidate pairs (a quadratic
  * with a hat on; measured 250× at ×10 data in round 18) — while the
  * trained-k-means cell blocking the entry now uses keeps per-cell
  * membership ~corpus/k and candidate volume linear. The spec measures
  * BOTH candidate generators on the same corpus so the negative result
  * is mechanical, not prose: if someone "fixes" the LSH geometry back
  * into the registry without re-deriving it, this fails. */
class LshNegativeResultSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("sign-LSH at threshold 0.45 is quadratic; cell blocking is linear") {
    val emb = Similarity.normalized(Tables(spark, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2

    // The withdrawn generator: candidates must exceed a QUADRATIC floor
    // (n²/32 — half the n²/16 expectation, slack for bucket skew).
    val lshCand = Similarity.lshCandidatePairs(emb).count()
    assert(lshCand >= allPairs / 16,
      s"sign-LSH candidates $lshCand vs all-pairs $allPairs — if this " +
        "ever prunes, re-adjudicate the negative result")

    // The shipped generator: candidates bounded LINEARLY. Cells seed at
    // every 25th vector, so expected membership ≈ 25 and candidates
    // ≈ n·(25−1)/2; 40·n is generous slack for post-Lloyd imbalance.
    val assigned = Similarity.kmeansAssign(emb, Similarity.kmeansCentroids(emb))
    val cellCand = assigned.as("a")
      .join(assigned.as("b"),
        org.apache.spark.sql.functions.col("a.cell") ===
          org.apache.spark.sql.functions.col("b.cell") &&
          org.apache.spark.sql.functions.col("a.vec_id") <
            org.apache.spark.sql.functions.col("b.vec_id"))
      .count()
    assert(cellCand <= 40L * n,
      s"cell-blocked candidates $cellCand exceed the linear bound for n=$n")
    assert(cellCand < lshCand,
      "cell blocking must dominate the withdrawn LSH geometry")
    emb.unpersist()
  }

  test("the negative result's oracle half still parses (CTE text is live)") {
    // lshCandCtes is kept as documentation-with-a-compiler; pin that it
    // still interpolates (a refactor that breaks it should fail here,
    // not silently rot the docs that cite it).
    val ctes = Similarity.lshCandCtes
    assert(ctes.contains("buckets AS ("))
    assert(ctes.contains("cand AS ("))
    assert("UNION ALL".r.findAllIn(ctes).size == 7) // 8 tables
  }
}
