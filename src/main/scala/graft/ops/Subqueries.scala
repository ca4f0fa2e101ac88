package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Exact._

/** Subquery-shaped capability surface: correlated scalar subqueries,
  * uncorrelated scalar compares, IN/EXISTS rewrites, HAVING against a
  * global aggregate, argmax-by-subquery, conditional aggregation, and
  * disjunctive join predicates (TPC-H Q11/Q12/Q14/Q15/Q17/Q18/Q19/Q22
  * shapes over the driver's schema — no partsupp/shipmode columns, so
  * those predicates are adapted to the columns that exist).
  *
  * Scale notes: every "scalar subquery" here is built as a one-row
  * aggregate cross-joined with an explicit [[broadcast]] hint — the
  * plan is a BroadcastNestedLoopJoin against a single row, i.e. free, and
  * identical in shape to what Catalyst's scalar-subquery rewrite emits.
  * Correlated per-group subqueries become aggregate-then-equi-join, which
  * shuffles each side once on the correlation key — the standard
  * decorrelation, hand-held so the join key and exchange reuse are
  * explicit. Nothing collects to the driver.
  */
object Subqueries {

  type Q = (SparkSession, String) => DataFrame

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems whose
    * quantity is below 20% of their part's average quantity. Decorrelated
    * to an aggregate + equi-join on the correlation key (l_partkey). */
  def qScalarCorrSubquery: Q = (s, dir) => {
    val t = Tables(s, dir)
    val perPart = t.lineitem
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    t.lineitem
      .join(perPart, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((qsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
           count(lit(1)).as("n"))
  }

  val qScalarCorrSubquerySql: String =
    s"""SELECT ${sqlQsum("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
       |FROM lineitem l1
       |WHERE l1.l_quantity < 0.2 * (
       |  SELECT ${sqlAvg("l2.l_quantity")}
       |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  /** HAVING against a global scalar subquery (TPC-H Q11 shape): customers
    * whose order revenue exceeds 0.1% of total order revenue. The global
    * total is a broadcast single-row aggregate. */
  def qHavingGlobalShare: Q = (s, dir) => {
    val t = Tables(s, dir)
    val perCust = t.orders.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total"))
    val global = t.orders.agg(dsum(col("o_totalprice")).as("gtotal"))
    perCust.crossJoin(broadcast(global))
      .filter(col("total") > col("gtotal") * lit(0.001))
      .select(col("o_custkey"), col("total"))
      .orderBy(col("total").desc, col("o_custkey"))
  }

  val qHavingGlobalShareSql: String =
    s"""SELECT o_custkey, ${sqlSum("o_totalprice")} AS total
       |FROM orders GROUP BY o_custkey
       |HAVING ${sqlSum("o_totalprice")} >
       |  (SELECT ${sqlSum("o_totalprice")} FROM orders) * 0.001
       |ORDER BY total DESC, o_custkey""".stripMargin

  /** Argmax via scalar subquery (TPC-H Q15 shape): the supplier(s) with
    * maximum revenue over a quarter. Revenue compares as exact integer
    * cents so the equality with MAX is bit-stable across engines. */
  def qTopSupplier: Q = (s, dir) => {
    val t = Tables(s, dir)
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + lit(0.5)).cast("long")
    val rev = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents).as("rev_cents"))
    val maxRev = rev.agg(max(col("rev_cents")).as("max_cents"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("rev_cents") === col("max_cents"))
      .join(t.supplierDim, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cents").cast("double") / 100.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val qTopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(FLOOR(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * 100 + 0.5) AS BIGINT)) AS rev_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev_cents AS DOUBLE) / 100.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_cents = (SELECT MAX(rev_cents) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** IN-subquery (TPC-H Q18 shape): large-volume orders — o_orderkey IN
    * (SELECT … HAVING SUM(qty) > 300). The IN becomes a left-semi join
    * against the having-filtered aggregate. */
  def qInSubqueryBigOrders: Q = (s, dir) => {
    val t = Tables(s, dir)
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sq"))
      .filter(col("sq") > 300.0)
      .select(col("l_orderkey").as("big_orderkey"))
    t.orders
      .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
               col("o_orderdate"), col("o_totalprice"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val qInSubqueryBigOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  ${sqlSum("l_quantity")} AS sum_qty
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
       |  HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > 300.0)
       |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Conditional aggregation (TPC-H Q12 shape, priority in place of
    * shipmode): high- vs low-priority line counts per linestatus. */
  def qConditionalAgg: Q = (s, dir) => {
    val t = Tables(s, dir)
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val qConditionalAggSql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Conditional-sum ratio (TPC-H Q14 shape): % of revenue from PROMO
    * parts in one month. Both sums quantize to cents before dividing. */
  def qPromoRatio: Q = (s, dir) => {
    val t = Tables(s, dir)
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
      .join(t.partDim, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * qsum(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0)))
              / qsum(disc)).as("promo_revenue"),
           count(lit(1)).as("n"))
  }

  val qPromoRatioSql: String = {
    val disc = "l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"
    s"""SELECT 100.0 * (${sqlQsum(s"CASE WHEN p_type = 'PROMO' THEN $disc ELSE 0.0 END")})
       |  / (${sqlQsum(disc)}) AS promo_revenue, COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin
  }

  /** Disjunctive join predicates (TPC-H Q19 shape): three OR'd
    * brand/size/quantity bands on top of the equi key. Catalyst extracts
    * the common l_partkey = p_partkey conjunct so this stays a hash join
    * with a residual filter — not a nested-loop cross product. */
  def qDisjunctiveJoin: Q = (s, dir) => {
    val t = Tables(s, dir)
    val bands =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#14" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#17" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
    t.lineitem
      .join(t.partDim, col("l_partkey") === col("p_partkey") && bands)
      .agg(qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n"))
  }

  val qDisjunctiveJoinSql: String =
    s"""SELECT ${sqlQsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Uncorrelated scalar compare + NOT EXISTS (TPC-H Q22 shape):
    * above-average-balance customers with no large orders, by nation. */
  def qRichInactiveCustomers: Q = (s, dir) => {
    val t = Tables(s, dir)
    val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("ab"))
    t.customer.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(t.orders.filter(col("o_totalprice") > 150000.0).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val qRichInactiveCustomersSql: String =
    s"""SELECT c_nationkey, COUNT(*) AS numcust, ${sqlSum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Value-range window frame (RANGE BETWEEN 30 PRECEDING): rolling
    * 30-day spend per customer, ordered by days-since-epoch so the frame
    * is a value range, not a row count. Money runs through integer cents
    * (value-based frames are order-stable, so this is exact). */
  def qWindowRangeFrame: Q = (s, dir) => {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d")).rangeBetween(-30, 0)
    t.orders
      .withColumn("d", datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date")))
      .withColumn("cents", floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .withColumn("r30_cents", sum(col("cents")).over(w))
      .withColumn("r30_n", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("d"),
        (col("r30_cents").cast("double") / 100.0).as("r30_total"), col("r30_n"))
      .orderBy(col("o_custkey"), col("d"), col("o_orderkey"))
  }

  val qWindowRangeFrameSql: String =
    """SELECT o_custkey, o_orderkey, d,
      |  CAST(r30_cents AS DOUBLE) / 100.0 AS r30_total, r30_n
      |FROM (
      |  SELECT o_custkey, o_orderkey, d,
      |    SUM(cents) OVER w AS r30_cents,
      |    COUNT(*) OVER w AS r30_n
      |  FROM (
      |    SELECT o_custkey, o_orderkey,
      |      CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS INTEGER) AS d,
      |      CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |    FROM orders)
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY d
      |               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)) t
      |ORDER BY o_custkey, d, o_orderkey""".stripMargin

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): build the complete monthly
    * calendar spine between the corpus min/max ship months by recursion —
    * no generator UDF, no driver-side sequence — then left-join
    * pre-aggregated monthly revenue onto it, so calendar gaps surface as
    * explicit zero rows. The recursion state carries the `hi` sentinel AS
    * A COLUMN: referencing the `bounds` CTE inside the recursive step
    * would re-evaluate its fact-table aggregate on EVERY iteration (83
    * extra scans — measured 10.9 s vs 0.6 s at sf0.001), so the anchor
    * reads it once and each step is a genuine one-row relation. Depth =
    * month span (83 here), bounded by `spark.sql.cteRecursionLevelLimit`
    * (default 100) — a multi-century spine would raise it or fall back to
    * `sequence()`. */
  def qRecursiveCte: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.createOrReplaceTempView("graft_li_rec")
    s.sql(
      s"""WITH RECURSIVE months AS (
         |  SELECT CAST(DATE_TRUNC('month', MIN(l_shipdate)) AS DATE) AS m,
         |         CAST(DATE_TRUNC('month', MAX(l_shipdate)) AS DATE) AS hi
         |  FROM graft_li_rec
         |  UNION ALL
         |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi
         |  FROM months WHERE m < hi),
         |rev AS (
         |  SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS m,
         |         COUNT(*) AS n_items, ${sqlSum("l_quantity")} AS qty
         |  FROM graft_li_rec GROUP BY 1)
         |SELECT months.m AS month, COALESCE(rev.n_items, 0) AS n_items,
         |       COALESCE(rev.qty, CAST(0 AS DOUBLE)) AS qty
         |FROM months LEFT JOIN rev ON months.m = rev.m
         |ORDER BY month""".stripMargin)
  }

  val qRecursiveCteSql: String =
    s"""WITH RECURSIVE months AS (
       |  SELECT CAST(DATE_TRUNC('month', MIN(l_shipdate)) AS DATE) AS m,
       |         CAST(DATE_TRUNC('month', MAX(l_shipdate)) AS DATE) AS hi
       |  FROM lineitem
       |  UNION ALL
       |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi
       |  FROM months WHERE m < hi),
       |rev AS (
       |  SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS m,
       |         COUNT(*) AS n_items, ${sqlSum("l_quantity")} AS qty
       |  FROM lineitem GROUP BY 1)
       |SELECT months.m AS month, COALESCE(rev.n_items, 0) AS n_items,
       |       COALESCE(rev.qty, CAST(0 AS DOUBLE)) AS qty
       |FROM months LEFT JOIN rev ON months.m = rev.m
       |ORDER BY month""".stripMargin

  /** Correlated LATERAL subquery (SQL:99 lateral derived table): per
    * nation, the top-2 suppliers by account balance — the "for each outer
    * row, run this parameterized subquery" surface. Catalyst decorrelates
    * the LIMIT-bearing lateral into a ranked window + filter over one
    * equi-join on the correlation key (no per-row re-execution, no
    * nested loop) — and then our [[graft.plans.WindowTopKRewrite]] fires
    * on that dead-rank window, so the lateral actually executes as the
    * native partial+final `TopKPerGroup` bounded heap (pinned in
    * PlanShapeSpec): the engine's own rewrites compose with Catalyst's
    * decorrelation with zero coordination. */
  def qLateralTopk: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.supplier.createOrReplaceTempView("graft_supp_lat")
    t.nation.createOrReplaceTempView("graft_nat_lat")
    s.sql(
      """SELECT n.n_name AS nation, top.s_name, top.s_acctbal
        |FROM graft_nat_lat n
        |JOIN LATERAL (
        |  SELECT s_name, s_acctbal FROM graft_supp_lat s
        |  WHERE s.s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_name
        |  LIMIT 2) top
        |ORDER BY nation, s_acctbal DESC, s_name""".stripMargin)
  }

  val qLateralTopkSql: String =
    """SELECT n.n_name AS nation, top.s_name, top.s_acctbal
      |FROM nation n
      |JOIN LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier s
      |  WHERE s.s_nationkey = n.n_nationkey
      |  ORDER BY s_acctbal DESC, s_name
      |  LIMIT 2) top ON TRUE
      |ORDER BY nation, s_acctbal DESC, s_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_recursive_cte"         -> qRecursiveCte,
    "q_lateral_topk"          -> qLateralTopk,
    "q_scalar_corr_subquery"  -> qScalarCorrSubquery,
    "q_having_global_share"   -> qHavingGlobalShare,
    "q_top_supplier"          -> qTopSupplier,
    "q_in_subquery_bigorders" -> qInSubqueryBigOrders,
    "q_conditional_agg"       -> qConditionalAgg,
    "q_promo_ratio"           -> qPromoRatio,
    "q_disjunctive_join"      -> qDisjunctiveJoin,
    "q_rich_inactive_cust"    -> qRichInactiveCustomers,
    "q_window_range_frame"    -> qWindowRangeFrame,
  )

  val oracles: Map[String, String] = Map(
    "q_recursive_cte"         -> qRecursiveCteSql,
    "q_lateral_topk"          -> qLateralTopkSql,
    "q_scalar_corr_subquery"  -> qScalarCorrSubquerySql,
    "q_having_global_share"   -> qHavingGlobalShareSql,
    "q_top_supplier"          -> qTopSupplierSql,
    "q_in_subquery_bigorders" -> qInSubqueryBigOrdersSql,
    "q_conditional_agg"       -> qConditionalAggSql,
    "q_promo_ratio"           -> qPromoRatioSql,
    "q_disjunctive_join"      -> qDisjunctiveJoinSql,
    "q_rich_inactive_cust"    -> qRichInactiveCustomersSql,
    "q_window_range_frame"    -> qWindowRangeFrameSql,
  )
}
