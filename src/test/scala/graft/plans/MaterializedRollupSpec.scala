package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The materialized-rollup rewrite: fires only when derivable, answers
  * from the summary parquet, and is invisible to results. */
class MaterializedRollupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val base = graft.sources.Tables(spark, dir).lineitem

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // Registers the rollup on first use (same path the query entry takes).
  private lazy val rollupReady: Unit = { PlanOps.queries("q_mv_rewrite")(spark, dir); () }

  test("derivable aggregate is answered from the rollup, not the base scan") {
    rollupReady
    val q = base.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"),
        max(col("l_extendedprice")).as("mx"))
    val p = scans(q)
    assert(p.contains("graft-mv"), s"rollup scan missing from plan:\n$p")
    assert(!p.contains("lineitem.parquet"), s"base table still scanned:\n$p")
    // And the answer is identical to the base computation (spark-side
    // exact: integer-valued doubles sum exactly in any grouping order).
    val viaRollup = q.orderBy(col("l_returnflag")).collect()
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"),
          max(col("l_extendedprice")).as("mx"))
        .orderBy(col("l_returnflag")).collect()
      assert(viaRollup === direct)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) } // re-register
  }

  test("filter on a rollup key commutes onto the summary table") {
    rollupReady
    val q = base.filter(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val p = scans(q)
    assert(p.contains("graft-mv") && !p.contains("lineitem.parquet"),
      s"key-only filter should not block the rewrite:\n$p")
  }

  test("non-derivable shapes fall back to the base table") {
    rollupReady
    val ungroupable = base.groupBy(col("l_suppkey")) // not a rollup key
      .agg(sum(col("l_quantity")).as("qty"))
    assert(scans(ungroupable).contains("lineitem.parquet"))

    val avgQuery = base.groupBy(col("l_returnflag")) // AVG not derivable
      .agg(avg(col("l_quantity")).as("aq"))
    assert(scans(avgQuery).contains("lineitem.parquet"))

    val exprSum = base.groupBy(col("l_returnflag")) // computed sum input
      .agg(sum(col("l_quantity") * 2).as("q2"))
    assert(scans(exprSum).contains("lineitem.parquet"))

    val nonKeyFilter = base.filter(col("l_quantity") > 10) // non-key filter
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    assert(scans(nonKeyFilter).contains("lineitem.parquet"))

    val distinctAgg = base.groupBy(col("l_returnflag")) // distinct never derivable
      .agg(countDistinct(col("l_suppkey")).as("nd"))
    assert(scans(distinctAgg).contains("lineitem.parquet"))
  }

  test("count(*) re-aggregates partial counts exactly") {
    rollupReady
    val viaRollup = base.groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n")).orderBy(col("l_linestatus"))
    assert(scans(viaRollup).contains("graft-mv"))
    val n = viaRollup.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(n === direct)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) }
  }
}
