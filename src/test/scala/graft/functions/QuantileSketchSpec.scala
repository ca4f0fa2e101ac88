package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The mergeable bottom-k quantile sketch (Udfs.qQuantileSketch): estimate
  * accuracy against the exact percentile, EXACT equality of the
  * build-then-merge path with a direct single-pass global sketch (the
  * mergeability guarantee), and invariance under repartitioning. */
class QuantileSketchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("merged-sketch quantile estimates land within 5% of the exact percentile") {
    val row = Udfs.qQuantileSketch(spark, dir).collect().head
    val exact = graft.sources.Tables(spark, dir).lineitem
      .select(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("p"))
      .collect().head.getSeq[Double](0)
    val ests = Seq(row.getDouble(0), row.getDouble(1), row.getDouble(2))
    ests.zip(exact).zip(Seq("p50", "p90", "p99")).foreach { case ((e, x), n) =>
      assert(math.abs(e - x) / x < 0.05,
        s"$n estimate $e strayed >5% from exact $x (sample_n=${row.getInt(3)})")
    }
    assert(row.getInt(3) === 2048, "merged sample should be full at this SF")
  }

  test("build-per-month then merge equals the direct global bottom-k (exact mergeability)") {
    val k = 2048
    val M = 2147483647L
    val pts = graft.sources.Tables(spark, dir).lineitem.select(
      date_trunc("month", col("l_shipdate")).as("month"),
      (((col("l_orderkey") * 8 + col("l_linenumber")) % M) * 2654435761L % M)
        .as("h"),
      (col("l_extendedprice") * 100).cast("long").as("cents"))
    val direct = pts.agg(call_function("graft_topk",
        -col("h").cast("double"), col("cents"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.score"), col("e.payload"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
    val viaMonths = pts.groupBy(col("month")).agg(call_function("graft_topk",
        -col("h").cast("double"), col("cents"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .agg(call_function("graft_topk",
        col("e.score"), col("e.payload"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.score"), col("e.payload"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
    assert(viaMonths === direct,
      "union-of-per-month-bottom-k must equal the global bottom-k")
  }

  test("rank error stays inside the theoretical 3·√(q(1−q)/k) bound on a skewed distribution") {
    // The accuracy CONTRACT for the 100 TB user: a bottom-k-by-hash sketch
    // is a uniform k-sample, so the estimated q-quantile's true rank is a
    // Binomial(k, q) mean with std √(q(1−q)/k) — the error is in RANK
    // space, independent of how skewed the VALUES are. k=2048 ⇒ p50 rank
    // error ≲ 3·0.01105 ≈ 0.033 at 3σ. Values here span 5 orders of
    // magnitude (exp ramp) to show value-skew does not degrade rank error.
    val k = 2048
    val n = 200000L
    val data = spark.range(n).select(
      col("id"),
      // exp ramp: half the mass below ~e^6≈400, top percentile ≥ ~e^11.9.
      exp(col("id").cast("double") / lit(n.toDouble) * 12.0).as("v"))
    val sample = data
      .agg(call_function("graft_topk",
        -abs(xxhash64(col("id"))).cast("double"),
        (col("v") * 1e6).cast("long"), lit(k)).as("sk"))
      .select(array_sort(transform(col("sk"), x => x.getField("payload"))).as("cs"),
        size(col("sk")).as("sn"))
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val est = sample.select(
        element_at(col("cs"), ceil(lit(q) * col("sn")).cast("int")) / 1e6)
        .collect().head.getDouble(0)
      // True rank of the estimate under the generating distribution.
      val rank = data.filter(col("v") <= est).count().toDouble / n
      val bound = 3.0 * math.sqrt(q * (1 - q) / k)
      assert(math.abs(rank - q) <= bound,
        f"q=$q: estimate $est%.1f has true rank $rank%.4f, " +
          f"off by ${math.abs(rank - q)}%.4f > 3σ bound $bound%.4f")
    }
  }

  test("estimates are invariant under input repartitioning") {
    val base = Udfs.qQuantileSketch(spark, dir).collect().head
    // Same query over a deliberately re-shuffled scan: merge order differs,
    // the deterministic total order must not.
    val li = graft.sources.Tables(spark, dir).lineitem.repartition(13)
    locally {
      val k = 2048
      val M = 2147483647L
      val pts = li.select(
        date_trunc("month", col("l_shipdate")).as("month"),
        (((col("l_orderkey") * 8 + col("l_linenumber")) % M) * 2654435761L % M)
          .as("h"),
        (col("l_extendedprice") * 100).cast("long").as("cents"))
      val merged = pts.groupBy(col("month")).agg(call_function("graft_topk",
          -col("h").cast("double"), col("cents"), lit(k)).as("sk"))
        .select(explode(col("sk")).as("e"))
        .agg(call_function("graft_topk",
          col("e.score"), col("e.payload"), lit(k)).as("sk"))
        .select(
          array_sort(transform(col("sk"), x => x.getField("payload"))).as("cs"),
          size(col("sk")).as("n"))
      val row = merged.select(
        (element_at(col("cs"), ceil(lit(0.5) * col("n")).cast("int")) / 100.0),
        (element_at(col("cs"), ceil(lit(0.9) * col("n")).cast("int")) / 100.0),
        (element_at(col("cs"), ceil(lit(0.99) * col("n")).cast("int")) / 100.0))
        .collect().head
      assert(row.getDouble(0) === base.getDouble(0))
      assert(row.getDouble(1) === base.getDouble(1))
      assert(row.getDouble(2) === base.getDouble(2))
    }
  }
}
