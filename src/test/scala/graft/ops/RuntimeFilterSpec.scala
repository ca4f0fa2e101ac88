package graft.ops

import graft.SparkTestBase

/** Runtime Bloom-filter join pruning — the declarative "semi-join
  * pushdown" a 100 TB join needs when partition pruning can't help.
  *
  * When one side of a shuffle join carries a selective filter, Spark's
  * `InjectRuntimeFilter` rule builds a Bloom filter over that side's join
  * keys (a subquery aggregate) and applies `bloom_filter_might_contain`
  * to the OTHER side before its shuffle — so probe rows that cannot match
  * are dropped at the scan instead of being shuffled, sorted, and
  * rejected by the join. At production thresholds this engages when the
  * application side scans ≥ 10 GB (`...applicationSideScanSizeThreshold`)
  * — exactly the 100 TB fact-table case; the spec shrinks the threshold
  * so test-scale data exercises the same code path. A config/Spark
  * upgrade regression here would silently revert large joins to
  * shuffle-everything, so the mechanism is pinned in CI like the AQE skew
  * split ([[AdaptiveSkewSpec]]). SCALE.md §runtime-filters documents when
  * it engages.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim filter injects a Bloom runtime filter on the fact side") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled"   -> "true",
      // Production default is 10 GB of application-side scan; shrink so
      // the sf0.001 fact side qualifies and the injection path runs.
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // Keep it a shuffle join: a broadcast join prunes via the hash
      // relation itself and would not need (or get) a Bloom filter.
      "spark.sql.autoBroadcastJoinThreshold"              -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val joined = t.lineitem
        .select(col("l_orderkey"), col("l_extendedprice"))
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime Bloom filter was not injected on the fact side:\n$optimized")
      // The filter must sit on the lineitem (application) side, keyed on
      // the join column, i.e. probe pruning happens before the shuffle.
      assert(optimized.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
        s"bloom filter not applied to the fact join key:\n$optimized")

      // Semantics unchanged: same result with the rule disabled.
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try joined.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
        finally spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      }
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(got == expected, "bloom-pruned join changed the join result")
      assert(got.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
