package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Column profiling — the data-quality sweep a pipeline runs before
  * pushing a table to a destination: per column, null count, distinct
  * count, and (numeric columns) min/max.
  *
  * Scale notes: ONE pass over the table computes every statistic as a
  * single wide aggregate row (all partial-aggregable, map-side combined),
  * then `stack` unpivots driver-side-free to one row per column — no
  * per-column scans, no collect. The distinct counts are the one
  * genuinely expensive item at 100 TB (each needs its own dedup state);
  * swap `countDistinct` for `approx_count_distinct` when exactness isn't
  * required — same plan shape, constant memory.
  */
object Profile {

  type Q = (SparkSession, String) => DataFrame

  private case class ColSpec(name: String, numeric: Boolean)

  private val orderCols = Seq(
    ColSpec("o_orderkey", numeric = true),
    ColSpec("o_custkey", numeric = true),
    ColSpec("o_orderstatus", numeric = false),
    ColSpec("o_totalprice", numeric = true),
    ColSpec("o_orderpriority", numeric = false))

  def qProfileOrders: Q = (s, dir) => {
    val t = Tables(s, dir).orders
    val aggs = orderCols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c.name))).as(s"${c.name}__nulls"),
        countDistinct(col(c.name)).as(s"${c.name}__distinct")) ++
        (if (c.numeric) Seq(
          min(col(c.name)).cast("double").as(s"${c.name}__min"),
          max(col(c.name)).cast("double").as(s"${c.name}__max"))
        else Seq.empty)
    }
    val wide = t.agg(aggs.head, aggs.tail: _*)
    val stackArgs = orderCols.map { c =>
      val mn = if (c.numeric) s"`${c.name}__min`" else "CAST(NULL AS DOUBLE)"
      val mx = if (c.numeric) s"`${c.name}__max`" else "CAST(NULL AS DOUBLE)"
      s"'${c.name}', `${c.name}__nulls`, `${c.name}__distinct`, $mn, $mx"
    }.mkString(", ")
    wide.select(expr(
        s"stack(${orderCols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_num, max_num)"))
      .orderBy(col("col_name"))
  }

  val qProfileOrdersSql: String = {
    val selects = orderCols.map { c =>
      val mn = if (c.numeric) s"CAST(MIN(${c.name}) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (c.numeric) s"CAST(MAX(${c.name}) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '${c.name}' AS col_name,
         |  COUNT(*) - COUNT(${c.name}) AS n_nulls,
         |  COUNT(DISTINCT ${c.name}) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num
         |FROM orders""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** The 100 TB profile: `approx_count_distinct` (HLL++, rsd 0.02) in
    * place of the exact distinct — constant memory per column instead of
    * a full dedup state; the sketch pass on its own is ONE map-only
    * aggregate (the production shape). Gated with the suite's
    * tolerance-boolean treatment: sketch VALUES are engine-specific,
    * sketch ERROR is a pure function of the data, so an exact-distinct
    * pass joins in (1 row × 1 row) and the emitted `distinct_within_5pct`
    * boolean (plus exact nulls/min/max) must hash-match the oracle's
    * TRUE. */
  def qProfileOrdersApprox: Q = (s, dir) => {
    val t = Tables(s, dir).orders
    // The exact distincts (gate input) and the HLL sketches MUST stay in
    // separate aggregates: five different countDistinct columns trigger
    // the distinct-rewrite (Expand ×6, first-phase groups = every distinct
    // value), and any sketch riding in that same Aggregate allocates its
    // multi-KB HLL buffer PER EXPANDED GROUP — measured 18–34 s at sf0.1
    // vs ~1 s split this way (each side keeps q_profile's own plan shape;
    // the join is 1 row × 1 row).
    val exactAggs = orderCols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c.name))).as(s"${c.name}__nulls"),
        countDistinct(col(c.name)).as(s"${c.name}__exact")) ++
        (if (c.numeric) Seq(
          min(col(c.name)).cast("double").as(s"${c.name}__min"),
          max(col(c.name)).cast("double").as(s"${c.name}__max"))
        else Seq.empty)
    }
    val approxAggs = orderCols.map { c =>
      approx_count_distinct(col(c.name), 0.02).as(s"${c.name}__approx")
    }
    val wide = t.agg(exactAggs.head, exactAggs.tail: _*)
      .join(t.agg(approxAggs.head, approxAggs.tail: _*))
    val stackArgs = orderCols.map { c =>
      val mn = if (c.numeric) s"`${c.name}__min`" else "CAST(NULL AS DOUBLE)"
      val mx = if (c.numeric) s"`${c.name}__max`" else "CAST(NULL AS DOUBLE)"
      val ok = s"ABS(CAST(`${c.name}__approx` AS DOUBLE) - `${c.name}__exact`) " +
        s"<= 0.05 * `${c.name}__exact`"
      s"'${c.name}', `${c.name}__nulls`, $ok, $mn, $mx"
    }.mkString(", ")
    wide.select(expr(
        s"stack(${orderCols.size}, $stackArgs) AS (col_name, n_nulls, distinct_within_5pct, min_num, max_num)"))
      .orderBy(col("col_name"))
  }

  val qProfileOrdersApproxSql: String = {
    val selects = orderCols.map { c =>
      val mn = if (c.numeric) s"CAST(MIN(${c.name}) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (c.numeric) s"CAST(MAX(${c.name}) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '${c.name}' AS col_name,
         |  COUNT(*) - COUNT(${c.name}) AS n_nulls,
         |  TRUE AS distinct_within_5pct,
         |  $mn AS min_num, $mx AS max_num
         |FROM orders""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Data-quality expectation suite (deequ-style "unit tests for data"):
    * one row per check with its violation count and pass flag — the gate a
    * pipeline evaluates before publishing a snapshot downstream.
    *
    * Scale shape: all orders-level checks fold into ONE wide aggregate
    * pass (map-side combined — uniqueness rides the same pass as its
    * count-distinct), the lineitem range check is a second single pass,
    * and referential integrity is one LEFT ANTI join on the key
    * (broadcast-able when the parent's key set is small; shuffled-on-key
    * otherwise — never a cartesian). Adding a check adds a column to a
    * pass, not a pass. */
  /** The suite is DECLARED as [[Dq.Check]] specs and compiled by
    * [[Dq.suite]] into the same plan the hand-written version had: one
    * wide pass per table + one anti-join for RI. The spec list doubles as
    * the in-flight `observe` config ([[Dq.observed]]). */
  def dqCheckSpecs: Seq[Dq.Check] = Seq(
    Dq.Unique("orders", "o_orderkey"),
    Dq.NotNull("orders", "o_custkey"),
    Dq.Satisfies("orders", "o_totalprice positive", col("o_totalprice") > 0),
    Dq.InRange("orders", "o_orderdate",
      to_date(lit("1992-01-01")), to_date(lit("1998-12-31"))),
    Dq.InRange("lineitem", "l_quantity", lit(1), lit(50), label = "in_1_50"))

  def qDqChecks: Q = (s, dir) => {
    val t = Tables(s, dir)
    Dq.suite(
      Map("orders" -> t.orders, "lineitem" -> t.lineitem),
      dqCheckSpecs,
      refs = Seq(Dq.RefIntegrity("lineitem", "l_orderkey", "orders", "o_orderkey")))
  }

  val qDqChecksSql: String =
    """WITH c AS (
      |  SELECT 'orders.o_orderkey unique' AS check_name,
      |         COUNT(*) - COUNT(DISTINCT o_orderkey) AS violations FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_custkey not_null', COUNT(*) - COUNT(o_custkey) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_totalprice positive',
      |         COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderdate in_range',
      |         COUNT(CASE WHEN o_orderdate < DATE '1992-01-01'
      |                      OR o_orderdate > DATE '1998-12-31' THEN 1 END) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_quantity in_1_50',
      |         COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey ref_orders', COUNT(*) FROM lineitem
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |)
      |SELECT check_name, violations, violations = 0 AS pass
      |FROM c ORDER BY check_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_profile"        -> qProfileOrders,
    "q_profile_approx" -> qProfileOrdersApprox,
    "q_dq_checks"      -> qDqChecks)
  val oracles: Map[String, String] = Map(
    "q_profile"        -> qProfileOrdersSql,
    "q_profile_approx" -> qProfileOrdersApproxSql,
    "q_dq_checks"      -> qDqChecksSql)
}
