package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The Bloom membership surface (`graft_bloom_agg` / `graft_might_contain`,
  * wrapping Spark's internal runtime-filter expressions): the oracle gate
  * for `dedup_contamination_bloom` can only pin the no-false-negative
  * guarantee, so the sketch-quality half — the false-positive rate the
  * 100 TB cost model depends on — is measured here engine-side.
  */
class BloomMembershipSpec extends SparkTestBase {

  private def buildFilter(ids: Seq[Long]): Array[Byte] = {
    import spark.implicits._
    ids.toDF("x")
      .agg(call_function("graft_bloom_agg", xxhash64(col("x")), lit(100000L), lit(800000L)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  test("no false negatives: every inserted member probes true") {
    import spark.implicits._
    val members = (0L until 5000L).map(_ * 7L + 1L)
    val bf = buildFilter(members)
    val missed = members.toDF("x")
      .filter(!call_function("graft_might_contain", lit(bf), xxhash64(col("x"))))
      .count()
    assert(missed == 0L, s"$missed members missed — Bloom guarantee violated")
  }

  test("false-positive rate stays near the sized bound") {
    import spark.implicits._
    val members = (0L until 5000L).map(_ * 7L + 1L)
    val bf = buildFilter(members)
    // Disjoint probe set: multiples of 7 are never ≡1 (mod 7).
    val probes = (0L until 20000L).map(_ * 7L)
    val fp = probes.toDF("x")
      .filter(call_function("graft_might_contain", lit(bf), xxhash64(col("x"))))
      .count()
    val rate = fp.toDouble / probes.size
    // 5k items in 800 kbits is ~160 bits/item — the realized rate should
    // be far under 1%; 5% headroom keeps the test hash-seed-robust.
    assert(rate < 0.05, f"false-positive rate $rate%.4f exceeds 5%%")
  }

  test("sketch is a compact binary, orders smaller than the member set") {
    val bf = buildFilter((0L until 5000L).map(_ * 7L + 1L))
    assert(bf.length < 200 * 1024, s"sketch unexpectedly large: ${bf.length} bytes")
    assert(bf.length > 1024, s"sketch suspiciously small: ${bf.length} bytes")
  }
}
