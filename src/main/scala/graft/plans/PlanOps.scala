package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Query entries exercising graft's whole-operator custom plans. */
object PlanOps {

  type Q = (SparkSession, String) => DataFrame

  /** Top-3 lineitems per supplier by price through [[TopKPerGroup]] — the
    * custom logical node + strategy + physical operator path. One hash
    * exchange on the group key, then a single bounded-heap pass; the
    * oracle is the ROW_NUMBER formulation the operator replaces. */
  def qTopKNativePlan: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    TopKPerGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  val qTopKNativePlanSql: String =
    """SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber FROM (
      |  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 3
      |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin

  /** The SAME top-3-per-supplier result, but written as the portable
    * ROW_NUMBER window idiom — [[WindowTopKRewrite]] (an injected
    * optimizer rule) recognizes the dead-rank pattern and swaps in
    * [[TopKPerGroupPlan]]. The plan pin (PlanShapeSpec) asserts the
    * executed plan contains TopKPerGroup and NO Window node: users write
    * the idiom, the engine runs the bounded heap. */
  def qTopKWindowRewrite: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(s, dir).lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  /** Materialized-rollup rewrite ([[MaterializedRollupRewrite]]): the
    * query is written against the BASE lineitem table — coarser group key
    * (l_returnflag ⊂ the rollup's (l_returnflag, l_linestatus)), plain
    * SUM/COUNT(*)/MIN/MAX — and the injected rule transparently answers
    * it from the pre-materialized summary parquet, re-aggregating partial
    * states. The oracle computes from the base table, so the gate proves
    * the rewrite is invisible to results; the plan pin (PlanShapeSpec)
    * proves the base table was NOT scanned. The summary is (re)built at
    * most once per (session, dir): rebuilding on every call would dwarf
    * the rewritten query — and a real MV is built once, refreshed on a
    * schedule, not per query. */
  def qMvRewrite: Q = (s, dir) => {
    ensureFlagStatusRollup(s, dir)
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).as("qty"),
        count(lit(1)).as("n"),
        avg(col("l_quantity")).as("aq"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      .orderBy(col("l_returnflag"))
  }

  /** Filesystem-safe marker tying a cached rollup to its scale factor. */
  private def mvTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "")

  /** Build-and-register the (l_returnflag, l_linestatus) summary once per
    * (session, dir) — shared by the flat and ROLLUP rewrite queries. */
  private def ensureFlagStatusRollup(s: SparkSession, dir: String): Unit = {
    val basePath = s"$dir/lineitem.parquet"
    MaterializedRollupRewrite.synchronized {
      val tag = s"graft-mv-${mvTag(dir)}"
      if (!MaterializedRollupRewrite.lookup(basePath)
            .exists(_.rollupPath.contains(tag))) {
        val rollupPath = java.nio.file.Files.createTempDirectory(tag).toString
        MaterializedRollupRewrite.create(
          s, basePath,
          keys = Seq("l_returnflag", "l_linestatus"),
          sumCols = Seq("l_quantity", "l_extendedprice"),
          minCols = Seq("l_extendedprice"),
          maxCols = Seq("l_extendedprice"),
          rollupPath = rollupPath)
      }
    }
  }

  /** ROLLUP over the SAME registered summary: each grouping-set level is a
    * grouping by a subset of the rollup keys, so the rule derives the
    * whole Expand tree from the summary (grouping-set re-aggregation of
    * partials) — a dashboard's `ROLLUP(a,b)` never touches the base. The
    * oracle computes from the base; PlanShapeSpec pins the base is not
    * scanned. */
  def qMvRewriteRollup: Q = (s, dir) => {
    ensureFlagStatusRollup(s, dir)
    Tables(s, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("qty"),
        count(lit(1)).as("n"),
        avg(col("l_quantity")).as("aq"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val qMvRewriteRollupSql: String =
    """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS qty, COUNT(*) AS n,
      |  AVG(l_quantity) AS aq,
      |  MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** The lattice/date-grain face of the MV catalog: a SECOND rollup of the
    * same base, keyed by raw `l_shipdate` (one row per ship day), serves a
    * query grouped by the MONTH — a deterministic expression of the key is
    * constant within each rollup group, so the summary re-groups by
    * `date_trunc('month', …)` soundly. The rule holds both lineitem
    * rollups at once and picks the derivable one per query (the
    * flag/status rollup can't cover a shipdate grouping and vice versa) —
    * which is exactly how a date-hierarchy lattice answers day/month/
    * quarter/year dashboards from one daily summary. */
  def qMvRewriteGrain: Q = (s, dir) => {
    val basePath = s"$dir/lineitem.parquet"
    MaterializedRollupRewrite.synchronized {
      val tag = s"graft-mvgrain-${mvTag(dir)}"
      if (!MaterializedRollupRewrite.lookup(basePath)
            .exists(_.rollupPath.contains(tag))) {
        val rollupPath = java.nio.file.Files.createTempDirectory(tag).toString
        MaterializedRollupRewrite.create(
          s, basePath,
          keys = Seq("l_shipdate"),
          sumCols = Seq("l_quantity"),
          rollupPath = rollupPath)
      }
    }
    Tables(s, dir).lineitem
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
      .orderBy(col("month"))
  }

  val qMvRewriteGrainSql: String =
    """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
      |  SUM(l_quantity) AS qty, COUNT(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** The decimal-exact face of the MV rewrite: the engine's canonical
    * money aggregates ([[graft.functions.Exact]].dsum / davg — `SUM(CAST(x
    * AS DECIMAL(28,4)))` shapes) answered from the same registered rollup.
    * The summary's sum partials ARE decimal(28,4) sums, so the re-fold is
    * exact and merge-order-independent — the partial states compose under
    * the same order-independence contract the direct query relies on; no
    * IEEE drift can distinguish the MV answer from the base answer at any
    * scale. This is the highest-value MV shape (revenue dashboards over
    * the fact table), and `davg` exercises the nested form: the aggregates
    * sit under a Cast and a Divide, not at the alias root. */
  def qMvRewriteExact: Q = (s, dir) => {
    ensureFlagStatusRollup(s, dir)
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.Exact.dsum(col("l_extendedprice")).as("revenue"),
        graft.functions.Exact.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val qMvRewriteExactSql: String =
    s"""SELECT l_returnflag,
       |  ${graft.functions.Exact.sqlSum("l_extendedprice")} AS revenue,
       |  ${graft.functions.Exact.sqlAvg("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Distinct counts from the summary: the rollup carries HLL SKETCH
    * partials (`g_hll_*` — DataSketches blobs whose register-max union is
    * exact and order-independent), so `hll_sketch_estimate(hll_sketch_agg
    * (col))` over the BASE rewrites to `hll_sketch_estimate(hll_union_agg
    * (partial))` over the summary — "distinct customers per segment"
    * dashboards answered without touching the fact table. The exact
    * distinct rides alongside FROM THE BASE (COUNT DISTINCT never
    * derives — that asymmetry is the point), and the gate checks the
    * sketch answer lands within 5% of it; the DuckDB oracle computes the
    * exact side and TRUE. PlanShapeSpec pins that the estimate half scans
    * the summary, not the base. */
  def qMvRewriteHll: Q = (s, dir) => {
    val basePath = s"$dir/orders.parquet"
    MaterializedRollupRewrite.synchronized {
      val tag = s"graft-mvhll-${mvTag(dir)}"
      if (!MaterializedRollupRewrite.lookup(basePath)
            .exists(_.rollupPath.contains(tag))) {
        val rollupPath = java.nio.file.Files.createTempDirectory(tag).toString
        MaterializedRollupRewrite.create(
          s, basePath,
          keys = Seq("o_orderstatus"),
          distinctCols = Seq("o_custkey"),
          rollupPath = rollupPath)
      }
    }
    val orders = Tables(s, dir).orders
    val est = orders.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
    val exact = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    est.join(exact, "o_orderstatus")
      .select(col("o_orderstatus"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= lit(0.05) * col("n_exact"))
          .as("within_5pct"))
      .orderBy(col("o_orderstatus"))
  }

  val qMvRewriteHllSql: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_exact,
      |  TRUE AS within_5pct
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val qMvRewriteSql: String =
    """SELECT l_returnflag, SUM(l_quantity) AS qty, COUNT(*) AS n,
      |  AVG(l_quantity) AS aq,
      |  MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_topk_native_plan"    -> qTopKNativePlan,
    "q_topk_window_rewrite" -> qTopKWindowRewrite,
    "q_mv_rewrite"          -> qMvRewrite,
    "q_mv_rewrite_grain"    -> qMvRewriteGrain,
    "q_mv_rewrite_rollup"   -> qMvRewriteRollup,
    "q_mv_rewrite_exact"    -> qMvRewriteExact,
    "q_mv_rewrite_hll"      -> qMvRewriteHll,
  )

  val oracles: Map[String, String] = Map(
    "q_topk_native_plan"    -> qTopKNativePlanSql,
    "q_topk_window_rewrite" -> qTopKNativePlanSql,
    "q_mv_rewrite"          -> qMvRewriteSql,
    "q_mv_rewrite_grain"    -> qMvRewriteGrainSql,
    "q_mv_rewrite_rollup"   -> qMvRewriteRollupSql,
    "q_mv_rewrite_exact"    -> qMvRewriteExactSql,
    "q_mv_rewrite_hll"      -> qMvRewriteHllSql,
  )
}
