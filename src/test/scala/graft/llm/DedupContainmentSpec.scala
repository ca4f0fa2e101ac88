package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The containment score's REASON TO EXIST: near-subset duplication that
  * symmetric Jaccard structurally cannot separate from noise. */
class DedupContainmentSpec extends SparkTestBase {

  test("a strict subset doc scores containment 1.0 but low Jaccard") {
    import spark.implicits._
    // 40-token host doc; the subset doc is its first 10 tokens verbatim.
    val host = (1 to 40).map(i => s"tok$i").mkString(" ")
    val sub = (1 to 10).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, host), (2L, sub), (3L, other)).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scores = Dedup.intersectionCounts(sh, None)
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / least(col("n1"), col("n2"))).as("containment"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter"))).as("jaccard"))
      .collect()
    assert(scores.length === 1, "only the (host, subset) pair overlaps")
    val r = scores.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    // All 8 of the subset's 3-shingles appear in the host: containment 1.
    assert(r.getDouble(2) === 1.0)
    // Jaccard = 8 / (38 + 8 - 8) ≈ 0.21 — BELOW every dedup threshold in
    // the suite: a Jaccard pass at 0.5/0.8 never finds this pair.
    assert(r.getDouble(3) < 0.25, s"jaccard was ${r.getDouble(3)}")
  }

  test("on the corpus, every containment pair clears the 0.9 bar and is ordered") {
    val out = Dedup.dedupContainment(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "the corpus' duplicate clusters must surface")
    assert(out.forall(_.getDouble(2) >= 0.9))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      out.map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq)
  }
}
