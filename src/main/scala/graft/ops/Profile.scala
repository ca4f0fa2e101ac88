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

  val queries: Map[String, Q] = Map(
    "q_profile"        -> qProfileOrders,
    "q_profile_approx" -> qProfileOrdersApprox)
  val oracles: Map[String, String] = Map(
    "q_profile"        -> qProfileOrdersSql,
    "q_profile_approx" -> qProfileOrdersApproxSql)
}
