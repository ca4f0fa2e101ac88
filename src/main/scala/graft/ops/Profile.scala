package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Benford first-digit screening of o_totalprice — the forensic DQ
    * check for fabricated/synthetic numeric columns: naturally-occurring
    * multi-scale amounts follow P(d) = log10(1+1/d); flat or spiked
    * digit histograms flag generated data, unit mixups, or truncation.
    * The expected probabilities are 6-dp LITERALS on both engines (no
    * libm log in the gate — the q_pagerank discipline taken one step
    * further: the constants ship with the check, like a stats table).
    * One map-side-combinable fold over the digit key; the comparison is
    * |freq − expected| per digit plus the aggregate total-variation
    * distance, all exactly-rounded arithmetic on counts.
    *
    * (This corpus's totalprice is synthetic-uniform, so the check
    * correctly REPORTS the deviation — the operator's job is measuring
    * it, not asserting conformity.) */
  def qDqBenford: Q = (s, dir) => {
    val benford = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
      4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
      8 -> 0.051153, 9 -> 0.045757)
    // First digit via integer rendering (floor → BIGINT → string): both
    // engines print integers canonically, where a raw double→string cast
    // can disagree on scientific notation.
    val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = Tables(s, dir).orders
      .filter(col("o_totalprice") >= 1)
      .groupBy(digit.as("d")).agg(count(lit(1)).as("c"))
    val n = counts.agg(sum(col("c")).as("n"))
    val expCol = benford.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (d, p)) =>
        acc.when(col("d") === d, lit(p)) }
    counts.crossJoin(broadcast(n))
      .select(col("d").cast("long").as("d"), col("c"),
        round(col("c").cast("double") / col("n"), 6).as("freq"),
        expCol.as("benford_p"))
      .withColumn("abs_dev", round(abs(col("freq") - col("benford_p")), 6))
      .orderBy(col("d"))
  }

  val qDqBenfordSql: String =
    """WITH counts AS (
      |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d,
      |         COUNT(*) AS c
      |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
      |n AS (SELECT SUM(c) AS n FROM counts),
      |e(d, p) AS (VALUES (1, 0.301030), (2, 0.176091), (3, 0.124939),
      |  (4, 0.096910), (5, 0.079181), (6, 0.066947), (7, 0.057992),
      |  (8, 0.051153), (9, 0.045757))
      |SELECT CAST(counts.d AS BIGINT) AS d, c,
      |  ROUND(CAST(c AS DOUBLE) / n.n, 6) AS freq,
      |  CAST(e.p AS DOUBLE) AS benford_p,
      |  ROUND(ABS(ROUND(CAST(c AS DOUBLE) / n.n, 6) - CAST(e.p AS DOUBLE)), 6) AS abs_dev
      |FROM counts JOIN e ON counts.d = e.d CROSS JOIN n
      |ORDER BY d""".stripMargin

  /** Join-key skew diagnostics for l_suppkey — the numbers an operator
    * reads BEFORE choosing a skew strategy (salt? AQE skew join? broadcast
    * the other side?): distinct-key count, max/mean frequency ratio, the
    * hottest key's share, and the Gini coefficient of the frequency
    * distribution (0 = uniform, →1 = one key owns the table).
    *
    * Shape: one map-side-combinable frequency fold collapses the fact
    * table to |keys| rows; everything after (rank window + the Gini sums)
    * runs on that collapsed relation — at 100 TB the diagnostic costs one
    * fact shuffle. Gini = (2·Σᵢ i·cᵢ)/(k·Σc) − (k+1)/k over ascending
    * counts: pure int64 sums, two exactly-rounded divisions, one
    * subtraction. */
  def qSkewStats: Q = (s, dir) => {
    val freq = Tables(s, dir).lineitem
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
    // The Gini rank runs over the KEY grain (suppliers — unbounded at
    // scale), so it ranks via the distributed two-level prefix kernel,
    // never a single-task global sort.
    val ranked = DistributedCumulate.runningTotals(
      freq, s.sessionState.conf.numShufflePartitions,
      Seq(col("c"), col("l_suppkey")), Nil, "i")
    ranked.agg(
        count(lit(1)).as("k"),
        sum(col("c")).as("tot"),
        max(col("c")).as("max_c"),
        sum(col("i") * col("c")).as("ic"))
      .select(
        col("k"),
        col("tot"),
        round(col("max_c") * col("k").cast("double") / col("tot"), 6).as("max_over_mean"),
        round(col("max_c").cast("double") / col("tot"), 6).as("top1_share"),
        round(lit(2.0) * col("ic") / (col("k").cast("double") * col("tot")) -
          (col("k") + 1).cast("double") / col("k"), 6).as("gini"))
  }

  val qSkewStatsSql: String =
    """WITH freq AS (
      |  SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
      |ranked AS (
      |  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, l_suppkey) AS BIGINT) AS i
      |  FROM freq),
      |agg AS (
      |  SELECT COUNT(*) AS k, CAST(SUM(c) AS BIGINT) AS tot,
      |    MAX(c) AS max_c, CAST(SUM(i * c) AS BIGINT) AS ic
      |  FROM ranked)
      |SELECT k, tot,
      |  ROUND(max_c * CAST(k AS DOUBLE) / tot, 6) AS max_over_mean,
      |  ROUND(CAST(max_c AS DOUBLE) / tot, 6) AS top1_share,
      |  ROUND(CAST(2.0 AS DOUBLE) * ic / (CAST(k AS DOUBLE) * tot) -
      |    CAST(k + 1 AS DOUBLE) / k, 6) AS gini
      |FROM agg""".stripMargin

  /** Distribution-drift monitoring: per day, the total-variation distance
    * between that day's event-type mix and the whole corpus's — the
    * pipeline-health check that catches a collector outage (one type
    * vanishes) or an instrumentation change (a new type floods in)
    * BEFORE it poisons downstream training data. TVD is the drift
    * metric with no log (KL's libm problem) and a direct reading: the
    * fraction of events you'd have to relabel to match the reference.
    *
    * Shape: the corpus collapses to (day × type) counts in one
    * map-side-combinable fold; the full grid (absent types MUST
    * contribute |0 − p| — a vanished type IS the drift) comes from a
    * cross join of two tiny relations; the per-day fold sums ≤|types|
    * exactly-computed deviations (1e-16 order noise vs the 6-dp grain). */
  def qTvdDrift: Q = (s, dir) => {
    val ev = Tables(s, dir).events
      .select(to_date(col("ts")).as("d"), col("event_type"))
    val byDay = ev.groupBy(col("d"), col("event_type")).agg(count(lit(1)).as("c"))
    val dayTot = byDay.groupBy(col("d")).agg(sum(col("c")).as("nd"))
    val glob = byDay.groupBy(col("event_type")).agg(sum(col("c")).as("cg"))
    val n = glob.agg(sum(col("cg")).as("n"))
    dayTot.crossJoin(broadcast(glob))
      .join(byDay, Seq("d", "event_type"), "left_outer")
      .crossJoin(broadcast(n))
      .select(col("d"), col("nd"),
        abs(coalesce(col("c"), lit(0L)).cast("double") / col("nd") -
          col("cg").cast("double") / col("n")).as("dev"))
      .groupBy(col("d"), col("nd"))
      .agg(round(sum(col("dev")) / 2.0, 6).as("tvd"))
      .select(col("d"), col("nd").as("n_events"), col("tvd"))
      .orderBy(col("d"))
  }

  val qTvdDriftSql: String =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_type FROM events),
      |by_day AS (SELECT d, event_type, COUNT(*) AS c FROM ev GROUP BY 1, 2),
      |day_tot AS (SELECT d, CAST(SUM(c) AS BIGINT) AS nd FROM by_day GROUP BY 1),
      |gmix AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS cg FROM by_day GROUP BY 1),
      |n AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM gmix),
      |grid AS (
      |  SELECT t.d, t.nd,
      |    ABS(CAST(COALESCE(b.c, 0) AS DOUBLE) / t.nd -
      |        CAST(g.cg AS DOUBLE) / n.n) AS dev
      |  FROM day_tot t CROSS JOIN gmix g
      |  LEFT JOIN by_day b ON b.d = t.d AND b.event_type = g.event_type
      |  CROSS JOIN n)
      |SELECT d, nd AS n_events, ROUND(SUM(dev) / 2.0, 6) AS tvd
      |FROM grid GROUP BY d, nd ORDER BY d""".stripMargin

  /** Join-fanout audit for orders⋈lineitem — the pre-join diagnostic
    * that predicts output cardinality and flags multiplicative blowups
    * BEFORE a 100 TB join runs: the distribution of lineitems per order
    * (min/p50/p90/max fanout, plus the expected join multiplier
    * Σf²/Σf — what one probe-side row fans into on average, weighted by
    * where the data actually sits). One map-side-combinable frequency
    * fold; the percentile runs over the collapsed per-key relation.
    * Σf² in int64 (≤ 7 lineitems/order: no overflow at any SF). */
  def qJoinFanout: Q = (s, dir) => {
    val f = Tables(s, dir).lineitem
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("f"))
    // The fanout percentiles run over the collapsed KEY grain —
    // unbounded at scale, so an ungrouped percentile() would buffer
    // every key's fanout in one task. exactContCuts distributes the
    // exact interpolated quantiles (PlanShapeSpec's percentile audit).
    val cuts = DistributedCumulate.exactContCuts(f, "f",
      Seq(0.5 -> "p50_f", 0.9 -> "p90_f"),
      s.sessionState.conf.numShufflePartitions)
    f.agg(
      count(lit(1)).as("n_keys"),
      min(col("f")).as("min_f"),
      max(col("f")).as("max_f"),
      round(sum(col("f") * col("f")).cast("double") / sum(col("f")), 6)
        .as("expected_multiplier"))
      .crossJoin(cuts)
      .select(col("n_keys"), col("min_f"), col("p50_f"), col("p90_f"),
        col("max_f"), col("expected_multiplier"))
  }

  val qJoinFanoutSql: String =
    """WITH f AS (SELECT l_orderkey, COUNT(*) AS f FROM lineitem GROUP BY 1)
      |SELECT COUNT(*) AS n_keys, MIN(f) AS min_f,
      |  quantile_cont(f, 0.5) AS p50_f, quantile_cont(f, 0.9) AS p90_f,
      |  MAX(f) AS max_f,
      |  ROUND(CAST(SUM(f * f) AS DOUBLE) / SUM(f), 6) AS expected_multiplier
      |FROM f""".stripMargin

  /** Per-group exact quartiles of order value — the standalone face of
    * [[DistributedCumulate.exactDiscCutsGrouped]] (RFM uses it through
    * an unpivot; this is the direct per-segment profiling read: value
    * quartiles per order priority). The priority's digit prefix is the
    * group ordinal, so ALL five groups' cutpoints come from ONE kernel
    * pass — five ungrouped `percentile_disc` buffers (or one grouped
    * sort-aggregate buffering per group in one task each) never run. */
  def qGroupQuantiles: Q = (s, dir) => {
    val o = Tables(s, dir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").minus(1).as("g"),
        col("o_orderpriority").as("priority"), col("o_totalprice"))
    val cuts = DistributedCumulate.exactDiscCutsGrouped(
      o, "g", "o_totalprice",
      Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75"),
      s.sessionState.conf.numShufflePartitions, gMax = 5)
    val labels = o.select(col("g"), col("priority")).distinct()
    cuts.join(labels, "g")
      .select(col("priority"), col("q25"), col("q50"), col("q75"))
      .orderBy(col("priority"))
  }

  val qGroupQuantilesSql: String =
    """SELECT o_orderpriority AS priority,
      |  quantile_disc(o_totalprice, 0.25) AS q25,
      |  quantile_disc(o_totalprice, 0.5)  AS q50,
      |  quantile_disc(o_totalprice, 0.75) AS q75
      |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin

  /** Median Absolute Deviation per group — THE robust dispersion
    * statistic (outlier-immune where stddev is not; the profiling
    * companion of [[qGroupQuantiles]]): per priority group, the median
    * of |v − median(v)| over integer order-value cents. TWO chained
    * grouped-kernel passes ([[DistributedCumulate.exactDiscCutsGrouped]]
    * — group-local buckets, no per-group sort-aggregate buffer), the
    * inner medians broadcast back onto the fact for the deviation fold.
    * Everything stays exact int64; output is cents. */
  def qMadGroup: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    // NOT cut (r17 call-site audit, measured A/B): three consumers
    // re-scan orders, but the upstream is a bare two-column vectorized
    // projection — the [[Lineage]] exception — and materializing the
    // fact-grain rows measured SLOWER than the re-scans (5.3 s vs 3.3 s
    // isolated at sf0.1).
    val o = Tables(s, dir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").minus(1).as("g"),
        col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
    val med = DistributedCumulate.exactDiscCutsGrouped(
      o, "g", "v", Seq(0.5 -> "med_cents"), B, gMax = 5)
    val dev = o.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") - col("med_cents")).as("d"))
    val mad = DistributedCumulate.exactDiscCutsGrouped(
      dev, "g", "d", Seq(0.5 -> "mad_cents"), B, gMax = 5)
    val labels = o.select(col("g"), col("priority")).distinct()
    labels.join(broadcast(med), "g").join(broadcast(mad), "g")
      .select(col("priority"), col("med_cents"), col("mad_cents"))
      .orderBy(col("priority"))
  }

  val qMadGroupSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v
      |  FROM orders),
      |med AS (SELECT priority,
      |    CAST(quantile_disc(v, 0.5) AS BIGINT) AS med_cents
      |  FROM o GROUP BY 1),
      |dev AS (SELECT o.priority, ABS(o.v - m.med_cents) AS d
      |  FROM o JOIN med m ON o.priority = m.priority),
      |mad AS (SELECT priority,
      |    CAST(quantile_disc(d, 0.5) AS BIGINT) AS mad_cents
      |  FROM dev GROUP BY 1)
      |SELECT m.priority, m.med_cents, a.mad_cents
      |FROM med m JOIN mad a ON m.priority = a.priority
      |ORDER BY m.priority""".stripMargin

  /** WEIGHTED median per group — the quantity-weighted price midpoint
    * (half the shipped QUANTITY lies at or below it), the statistic
    * behind volume-weighted pricing cuts. The direct consumer of
    * [[DistributedCumulate.groupedRunningSum]]: weights pre-aggregate
    * to the (group, value) grain (SUM(weight), not COUNT — the
    * generalization the kernel's cntCol makes free), the per-group
    * cumulative weight comes from group-local bucket windows, and the
    * hit rule is percentile_disc's with weight mass in place of row
    * count: the smallest value whose cumulative weight reaches half the
    * group total. Thresholds evaluate in double exactly like the
    * kernel's (q·n), mirrored in the oracle. */
  def qWeightedMedianGroup: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    val l = Tables(s, dir).lineitem
      .select(
        when(col("l_returnflag") === "A", 0)
          .when(col("l_returnflag") === "N", 1).otherwise(2).as("g"),
        col("l_returnflag").as("returnflag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("v"),
        col("l_quantity").cast("long").as("wt"))
    val wsum = l.groupBy(col("g"), col("returnflag"), col("v"))
      .agg(sum(col("wt")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cum = DistributedCumulate.groupedRunningSum(
      wsum, "g", "v", "c", B, gMax = 3, "cum", "tot")
    val target = lit(0.5) * col("tot").cast("double")
    val hit = (col("cum").cast("double") >= target) &&
      ((col("cum") - col("c")).cast("double") < target)
    cum.groupBy(col("returnflag"))
      .agg(max(when(hit, col("v"))).as("wmedian_cents"),
        max(col("tot")).as("total_qty"))
      .orderBy(col("returnflag"))
  }

  val qWeightedMedianGroupSql: String =
    """WITH l AS (
      |  SELECT l_returnflag AS returnflag,
      |    CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS v,
      |    CAST(l_quantity AS BIGINT) AS wt
      |  FROM lineitem),
      |w AS (SELECT returnflag, v, CAST(SUM(wt) AS BIGINT) AS c
      |      FROM l GROUP BY 1, 2),
      |c AS (SELECT returnflag, v, c,
      |    CAST(SUM(c) OVER (PARTITION BY returnflag ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY returnflag) AS BIGINT) AS tot
      |  FROM w)
      |SELECT returnflag,
      |  MAX(CASE WHEN CAST(cum AS DOUBLE) >= 0.5 * CAST(tot AS DOUBLE)
      |        AND CAST(cum - c AS DOUBLE) < 0.5 * CAST(tot AS DOUBLE)
      |      THEN v END) AS wmedian_cents,
      |  MAX(tot) AS total_qty
      |FROM c GROUP BY returnflag ORDER BY returnflag""".stripMargin

  /** Inter-arrival median per market segment — the order-cadence
    * profile (median days between a customer's CONSECUTIVE orders,
    * grouped by segment): purchase-frequency distributions are the
    * canonical churn/engagement profiling statistic, and "median of
    * per-entity sequence gaps" is a shape none of the other profiling
    * entries exercise. Two kernels compose: consecutive gaps come from
    * a lag window partitioned by o_custkey — HIGH-cardinality, so each
    * task sorts only one customer's handful of orders (the
    * dimension-bounded-window audit's allowed class) — and the
    * per-segment median comes from
    * [[DistributedCumulate.exactDiscCutsGrouped]] (group-local buckets,
    * no 5-way sort serialization). The gap multiset is tie-order
    * invariant: equal dates yield 0-day gaps under ANY tiebreak, so the
    * o_orderkey tiebreak only pins engine-side determinism, not the
    * answer. Integer day counts end to end. */
  def qInterarrivalMedian: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = t.orders
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), col("prev")).cast("long").as("gap"))
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment"))
    // Slim survivor set, CUT: both consumers (the kernel's fold and the
    // per-segment count) re-ran the lag window + join otherwise — the
    // exchange below the window is reused, but the sort + window + join
    // re-execute per consumer (r17 call-site audit; 1.76× drift, r16
    // verdict).
    val g = Lineage.cut(gaps.join(seg, gaps("o_custkey") === seg("c_custkey"))
      .select(
        when(col("c_mktsegment") === "AUTOMOBILE", 0)
          .when(col("c_mktsegment") === "BUILDING", 1)
          .when(col("c_mktsegment") === "FURNITURE", 2)
          .when(col("c_mktsegment") === "HOUSEHOLD", 3)
          .otherwise(4).as("g"),
        col("c_mktsegment").as("segment"), col("gap")))
    val med = DistributedCumulate.exactDiscCutsGrouped(
      g, "g", "gap", Seq(0.5 -> "med_gap_days"), B, gMax = 5)
    g.groupBy(col("g"), col("segment")).agg(count(lit(1)).as("n_gaps"))
      .join(broadcast(med), "g")
      .select(col("segment"), col("n_gaps"), col("med_gap_days"))
      .orderBy(col("segment"))
  }

  val qInterarrivalMedianSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate,
      |    lag(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |g AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(date_diff('day', prev, o_orderdate) AS BIGINT) AS gap
      |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE prev IS NOT NULL)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(quantile_disc(gap, 0.5) AS BIGINT) AS med_gap_days
      |FROM g GROUP BY segment ORDER BY segment""".stripMargin

  /** 10% TRIMMED mean per group — the third robust-location statistic
    * next to [[qMadGroup]] and [[qWeightedMedianGroup]]: the mean of
    * order values inside the group's [p10, p90] band (percentile_disc
    * cut points from the grouped kernel, so both engines draw the SAME
    * integer fences), outlier-immune where the raw mean is not. One
    * kernel pass for the fences (broadcast back — ≤ gMax rows), one
    * filtered map-side-combined sum/count, one exactly-rounded
    * division. No per-group sort anywhere. */
  def qTrimmedMeanGroup: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    // NOT cut (r17 call-site audit): both consumers re-scan orders, a
    // bare two-column vectorized projection — the [[Lineage]] exception;
    // the A/B measured the cut as no better than the re-scan.
    val o = Tables(s, dir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").minus(1).as("g"),
        col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
    val cuts = DistributedCumulate.exactDiscCutsGrouped(
      o, "g", "v", Seq(0.1 -> "p10", 0.9 -> "p90"), B, gMax = 5)
    o.join(broadcast(cuts), "g")
      .filter(col("v") >= col("p10") && col("v") <= col("p90"))
      .groupBy(col("g"), col("priority"))
      .agg(count(lit(1)).as("n_kept"), sum(col("v")).as("sum_cents"))
      .select(col("priority"), col("n_kept"),
        round(col("sum_cents").cast("double") / col("n_kept"), 6).as("trimmed_mean_cents"))
      .orderBy(col("priority"))
  }

  val qTrimmedMeanGroupSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v
      |  FROM orders),
      |cuts AS (SELECT priority,
      |    CAST(quantile_disc(v, 0.1) AS BIGINT) AS p10,
      |    CAST(quantile_disc(v, 0.9) AS BIGINT) AS p90
      |  FROM o GROUP BY 1)
      |SELECT o.priority, COUNT(*) AS n_kept,
      |  ROUND(CAST(SUM(o.v) AS DOUBLE) / COUNT(*), 6) AS trimmed_mean_cents
      |FROM o JOIN cuts ON o.priority = cuts.priority
      |WHERE o.v >= cuts.p10 AND o.v <= cuts.p90
      |GROUP BY o.priority ORDER BY o.priority""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov drift test — the CONTINUOUS
    * companion of [[qTvdDrift]]'s categorical TVD: D = max |F1 − F2|
    * over the union of observed values, between the URGENT and LOW
    * priority bands' order-value distributions, with the α=0.05
    * critical value and the accept/reject verdict.
    *
    * Shape: the classic formulation sorts the pooled sample in one
    * task. Here the pool collapses to DISTINCT integer cents with
    * per-sample counts (the only full-relation pass, map-side
    * combined), then [[DistributedCumulate.runningTotals]] gives every
    * distinct value BOTH cumulative counts without any unpartitioned
    * window (range-bucketed prefix sums), the sample sizes ride the
    * same pass as constant columns, and the argmax row is a bounded
    * top-1 heap. Every F1/F2 evaluation divides exact int64 cumulative
    * counts — both engines see identical doubles, so the unrounded
    * D > crit comparison agrees. */
  def qKsDrift: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    val o = Tables(s, dir).orders
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"),
        when(col("o_orderpriority").startsWith("1"), lit(1L)).otherwise(lit(0L)).as("s1"),
        when(col("o_orderpriority").startsWith("5"), lit(1L)).otherwise(lit(0L)).as("s2"))
    val c = o.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
    val cum = DistributedCumulate.runningTotals(c, B, Seq(col("v")),
      Seq("c1" -> "cum1", "c2" -> "cum2"), "rk",
      extraAggs = Seq(sum(col("c1")) -> "n1", sum(col("c2")) -> "n2"))
    val crit = lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
      (col("n1").cast("double") * col("n2")))
    cum
      .withColumn("d", abs(col("cum1").cast("double") / col("n1") -
        col("cum2").cast("double") / col("n2")))
      .orderBy(col("d").desc, col("v"))
      .limit(1)
      .select(col("n1"), col("n2"), round(col("d"), 9).as("ks_d"),
        col("v").as("ks_at_cents"), round(crit, 9).as("crit_005"),
        (col("d") > crit).as("reject_005"))
  }

  val qKsDriftSql: String =
    """WITH o AS (
      |  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS s1,
      |    CASE WHEN o_orderpriority LIKE '5%' THEN 1 ELSE 0 END AS s2
      |  FROM orders
      |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'),
      |c AS (SELECT v, CAST(SUM(s1) AS BIGINT) AS c1,
      |             CAST(SUM(s2) AS BIGINT) AS c2 FROM o GROUP BY v),
      |n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |             CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
      |cum AS (SELECT v,
      |    CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
      |    CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cum2 FROM c),
      |d AS (SELECT v, n1, n2,
      |    ABS(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2) AS d,
      |    CAST(1.358 AS DOUBLE) *
      |      SQRT(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)) AS crit
      |  FROM cum CROSS JOIN n)
      |SELECT n1, n2, ROUND(d, 9) AS ks_d, v AS ks_at_cents,
      |  ROUND(crit, 9) AS crit_005, d > crit AS reject_005
      |FROM d ORDER BY d DESC, v LIMIT 1""".stripMargin

  /** Mann–Whitney U rank-sum test — the NONPARAMETRIC companion of
    * [[qKsDrift]] over the same two samples (URGENT vs LOW order
    * values): where KS asks "are the distributions different anywhere",
    * U asks "does one stochastically dominate", robust to outliers the
    * t-test would chase. Midranks (tie-averaged), tie-corrected normal
    * approximation, α=0.05 two-sided verdict.
    *
    * Shape: the textbook formulation ranks the POOLED sample in one
    * sort. Here the pool collapses to distinct values with per-sample
    * counts, [[DistributedCumulate.runningTotals]] gives each value its
    * exclusive pooled predecessor count, and the whole statistic stays
    * EXACT — int64 per value, DECIMAL(38,0) for every product of two
    * data-bounded integers: doubled rank sum 2·R1 = Σ c1·(2·cum_before
    * + t + 1) (doubling clears the midrank halves), tie term Σ(t³−t) —
    * so
    * both engines reach z through identical correctly-rounded double
    * ops on identical integers, and the unrounded |z| > 1.96 verdict
    * agrees. One map-side-combinable final fold; no global sort
    * anywhere. */
  def qMannWhitney: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    val o = Tables(s, dir).orders
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"),
        when(col("o_orderpriority").startsWith("1"), lit(1L)).otherwise(lit(0L)).as("s1"),
        when(col("o_orderpriority").startsWith("5"), lit(1L)).otherwise(lit(0L)).as("s2"))
    val c = o.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
      .withColumn("t", col("c1") + col("c2"))
    val cum = DistributedCumulate.runningTotals(c, B, Seq(col("v")),
      Seq("t" -> "cumt"), "rk",
      extraAggs = Seq(sum(col("c1")) -> "n1", sum(col("c2")) -> "n2"))
    // Per-row products of DATA-bounded longs fold in DECIMAL(38,0):
    // c1·(2·cum+…) reaches ~2n² and t³ wraps past 2.1e6 ties if left in
    // int64 (verdict-r14 #1). Cast the FIRST factor before the multiply
    // — the qWelchTtest discipline — so Spark folds exactly where DuckDB
    // folds in HUGEINT; the engines stay bit-identical at every scale.
    val agg = cum
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("c1").cast("decimal(38,0)") *
          (lit(2L) * (col("cumt") - col("t")) + col("t") + lit(1L)))
          .as("r1x2"),
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .as("ties"))
    val nn = (col("n1") + col("n2")).cast("double")
    val z = (col("u1x2").cast("double") / 2.0 -
        col("n1").cast("double") * col("n2") / 2.0) /
      sqrt(col("n1").cast("double") * col("n2") / 12.0 *
        ((nn + lit(1.0)) - col("ties").cast("double") / (nn * (nn - lit(1.0)))))
    // u1_x2 ≈ 2n² exceeds int64 past n ≈ 2·10⁹, so the exact decimal is
    // surfaced as DOUBLE (one correctly-rounded cast, identical on both
    // engines); n1·(n1+1) likewise folds in decimal.
    agg
      .withColumn("u1x2", col("r1x2") -
        col("n1").cast("decimal(38,0)") * (col("n1") + lit(1L)))
      .select(col("n1"), col("n2"), col("u1x2").cast("double").as("u1_x2"),
        round(z, 6).as("z"), (abs(z) > 1.96).as("reject_005"))
  }

  val qMannWhitneySql: String =
    """WITH o AS (
      |  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS s1,
      |    CASE WHEN o_orderpriority LIKE '5%' THEN 1 ELSE 0 END AS s2
      |  FROM orders
      |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'),
      |c AS (SELECT v, CAST(SUM(s1) AS BIGINT) AS c1,
      |             CAST(SUM(s2) AS BIGINT) AS c2 FROM o GROUP BY v),
      |cum AS (SELECT c1, c2, c1 + c2 AS t,
      |    CAST(SUM(c1 + c2) OVER (ORDER BY v) AS BIGINT) AS cumt FROM c),
      |n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |             CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
      |agg AS (SELECT
      |    SUM(CAST(c1 AS HUGEINT) * (2*(cumt - t) + t + 1)) AS r1x2,
      |    SUM(CAST(t AS HUGEINT)*t*t - t) AS ties FROM cum),
      |stat AS (SELECT n1, n2,
      |    CAST(r1x2 - CAST(n1 AS HUGEINT)*(n1 + 1) AS DOUBLE) AS u1_x2, ties,
      |    CAST(n1 + n2 AS DOUBLE) AS nn
      |  FROM agg CROSS JOIN n)
      |SELECT n1, n2, u1_x2,
      |  ROUND((CAST(u1_x2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
      |    / SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0 *
      |        ((nn + 1.0) - CAST(ties AS DOUBLE) / (nn * (nn - 1.0)))), 6) AS z,
      |  ABS((CAST(u1_x2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
      |    / SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0 *
      |        ((nn + 1.0) - CAST(ties AS DOUBLE) / (nn * (nn - 1.0))))) > 1.96
      |    AS reject_005
      |FROM stat""".stripMargin

  /** Welch's unequal-variance t-test — the PARAMETRIC member of the
    * two-sample battery ([[qKsDrift]] distributional, [[qMannWhitney]]
    * rank-based, this one mean-based with the Welch–Satterthwaite df):
    * does the URGENT band's mean order value differ from the LOW
    * band's. ONE map-side-combinable pass folds both samples' exact
    * integer moments (n, Σv, Σv² — the squares summed as DECIMAL(38,0)
    * so cent-scale values can't overflow int64 at any SF), then t and
    * df are fixed-shape double arithmetic on exact integers — identical
    * correctly-rounded ops on both engines, so the unrounded verdict
    * comparison agrees. No shuffle beyond the one aggregate. */
  def qWelchTtest: Q = (s, dir) => {
    val o = Tables(s, dir).orders
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"),
        when(col("o_orderpriority").startsWith("1"), lit(1L)).otherwise(lit(0L)).as("s1"))
    val m = o.agg(
      sum(col("s1")).as("n1"), sum(lit(1L) - col("s1")).as("n2"),
      sum(col("v") * col("s1")).as("sum1"),
      sum(col("v") * (lit(1L) - col("s1"))).as("sum2"),
      sum((col("v") * col("v") * col("s1")).cast("decimal(38,0)")).as("q1"),
      sum((col("v") * col("v") * (lit(1L) - col("s1"))).cast("decimal(38,0)")).as("q2"))
    val m1 = col("sum1").cast("double") / col("n1")
    val m2 = col("sum2").cast("double") / col("n2")
    val var1 = (col("q1").cast("double") -
      col("sum1").cast("double") * col("sum1") / col("n1")) / (col("n1") - lit(1L))
    val var2 = (col("q2").cast("double") -
      col("sum2").cast("double") * col("sum2") / col("n2")) / (col("n2") - lit(1L))
    val se1 = var1 / col("n1")
    val se2 = var2 / col("n2")
    val t = (m1 - m2) / sqrt(se1 + se2)
    val dfW = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (col("n1") - lit(1L)) + se2 * se2 / (col("n2") - lit(1L)))
    m.select(col("n1"), col("n2"),
      round(m1 - m2, 6).as("mean_diff_cents"),
      round(t, 6).as("t"), round(dfW, 3).as("df"),
      (abs(t) > 1.96).as("reject_005"))
  }

  val qWelchTtestSql: String =
    """WITH o AS (
      |  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS s1
      |  FROM orders
      |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'),
      |m AS (SELECT
      |    CAST(SUM(s1) AS BIGINT) AS n1,
      |    CAST(SUM(1 - s1) AS BIGINT) AS n2,
      |    CAST(SUM(v * s1) AS BIGINT) AS sum1,
      |    CAST(SUM(v * (1 - s1)) AS BIGINT) AS sum2,
      |    SUM(CAST(v * v * s1 AS HUGEINT)) AS q1,
      |    SUM(CAST(v * v * (1 - s1) AS HUGEINT)) AS q2
      |  FROM o),
      |e AS (SELECT n1, n2,
      |    CAST(sum1 AS DOUBLE) / n1 AS m1, CAST(sum2 AS DOUBLE) / n2 AS m2,
      |    (CAST(q1 AS DOUBLE) - CAST(sum1 AS DOUBLE) * sum1 / n1) / (n1 - 1)
      |      / n1 AS se1,
      |    (CAST(q2 AS DOUBLE) - CAST(sum2 AS DOUBLE) * sum2 / n2) / (n2 - 1)
      |      / n2 AS se2
      |  FROM m)
      |SELECT n1, n2, ROUND(m1 - m2, 6) AS mean_diff_cents,
      |  ROUND((m1 - m2) / SQRT(se1 + se2), 6) AS t,
      |  ROUND((se1 + se2) * (se1 + se2)
      |    / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 3) AS df,
      |  ABS((m1 - m2) / SQRT(se1 + se2)) > 1.96 AS reject_005
      |FROM e""".stripMargin

  /** One-way ANOVA F-test across ALL five priority bands — the k-group
    * generalization of [[qWelchTtest]] (is ANY band's mean different):
    * F = (SSB/(k−1)) / (SSW/(N−k)) from one pass of exact integer
    * moments per group. The k-term Σ S_g²/n_g fold is the one place
    * engines could diverge (aggregate order over doubles is
    * unspecified), so it is PIVOTED into five conditional aggregates
    * added in a fixed left-associative chain — both engines evaluate
    * the identical expression tree. Squares sum as DECIMAL(38,0)
    * (int64-safe at any SF). */
  def qAnovaGroups: Q = (s, dir) => {
    val o = Tables(s, dir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("g"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
    def ind(i: Int) = when(col("g") === i, lit(1L)).otherwise(lit(0L))
    val aggs =
      (1 to 5).flatMap { i =>
        Seq(sum(ind(i)).as(s"n$i"), sum(col("v") * ind(i)).as(s"s$i"))
      } :+ sum((col("v") * col("v")).cast("decimal(38,0)")).as("q")
    val m = o.agg(aggs.head, aggs.tail: _*)
    def term(i: Int): org.apache.spark.sql.Column =
      col(s"s$i").cast("double") * col(s"s$i") / col(s"n$i")
    val ssg = term(1) + term(2) + term(3) + term(4) + term(5)
    val n = col("n1") + col("n2") + col("n3") + col("n4") + col("n5")
    val sTot = col("s1") + col("s2") + col("s3") + col("s4") + col("s5")
    val ssb = ssg - sTot.cast("double") * sTot / n
    val ssw = col("q").cast("double") - ssg
    val f = (ssb / lit(4.0)) / (ssw / (n - lit(5L)).cast("double"))
    m.select(n.as("n"), round(f, 6).as("f"),
      round(ssb / (col("q").cast("double") - sTot.cast("double") * sTot / n), 6)
        .as("eta_sq"),
      (f > 2.372).as("reject_005"))
  }

  val qAnovaGroupsSql: String =
    """WITH o AS (
      |  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS g,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v
      |  FROM orders),
      |m AS (SELECT
      |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN g = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN g = 2 THEN v ELSE 0 END) AS BIGINT) AS s2,
      |    CAST(SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |    CAST(SUM(CASE WHEN g = 3 THEN v ELSE 0 END) AS BIGINT) AS s3,
      |    CAST(SUM(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
      |    CAST(SUM(CASE WHEN g = 4 THEN v ELSE 0 END) AS BIGINT) AS s4,
      |    CAST(SUM(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
      |    CAST(SUM(CASE WHEN g = 5 THEN v ELSE 0 END) AS BIGINT) AS s5,
      |    SUM(CAST(v * v AS HUGEINT)) AS q
      |  FROM o),
      |e AS (SELECT n1 + n2 + n3 + n4 + n5 AS n,
      |    CAST(s1 AS DOUBLE) * s1 / n1 + CAST(s2 AS DOUBLE) * s2 / n2
      |      + CAST(s3 AS DOUBLE) * s3 / n3 + CAST(s4 AS DOUBLE) * s4 / n4
      |      + CAST(s5 AS DOUBLE) * s5 / n5 AS ssg,
      |    s1 + s2 + s3 + s4 + s5 AS st, CAST(q AS DOUBLE) AS qd
      |  FROM m),
      |st AS (SELECT n,
      |    ssg - CAST(st AS DOUBLE) * st / n AS ssb,
      |    qd - ssg AS ssw,
      |    qd - CAST(st AS DOUBLE) * st / n AS sst
      |  FROM e)
      |SELECT n, ROUND((ssb / 4.0) / (ssw / CAST(n - 5 AS DOUBLE)), 6) AS f,
      |  ROUND(ssb / sst, 6) AS eta_sq,
      |  (ssb / 4.0) / (ssw / CAST(n - 5 AS DOUBLE)) > 2.372 AS reject_005
      |FROM st""".stripMargin

  /** REFERENTIAL-integrity audit over the star schema — the DQ check
    * [[qDqChecks]]'s single-table rules can't express: per foreign-key
    * relationship, how many child rows point at a parent that does not
    * exist (orphans), as count and rate. On a lake with independent
    * ingest jobs per table this is the first thing that breaks, and the
    * number every join in the suite silently depends on.
    *
    * Shape: one LEFT ANTI join per relationship (shuffle hash join on
    * the key at scale; the nation side broadcasts), each folding to a
    * single count — the child table is scanned once per relationship
    * and nothing wider than (key) is carried. */
  def qDqReferential: Q = (s, dir) => {
    val t = Tables(s, dir)
    def rel(name: String, child: DataFrame, ck: String,
            parent: DataFrame, pk: String): DataFrame = {
      val c = child.select(col(ck))
      val orphans = c.join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
      c.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_child"), 6).as("orphan_rate"))
    }
    rel("lineitem.orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .unionByName(rel("orders.custkey->customer", t.orders, "o_custkey",
        t.customer, "c_custkey"))
      .unionByName(rel("customer.nationkey->nation", t.customer, "c_nationkey",
        t.nation, "n_nationkey"))
      .orderBy(col("relationship"))
  }

  val qDqReferentialSql: String =
    """WITH r1 AS (SELECT 'lineitem.orderkey->orders' AS relationship,
      |    (SELECT COUNT(*) FROM lineitem) AS n_child,
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans),
      |r2 AS (SELECT 'orders.custkey->customer' AS relationship,
      |    (SELECT COUNT(*) FROM orders) AS n_child,
      |    (SELECT COUNT(*) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                       WHERE c.c_custkey = o.o_custkey)) AS n_orphans),
      |r3 AS (SELECT 'customer.nationkey->nation' AS relationship,
      |    (SELECT COUNT(*) FROM customer) AS n_child,
      |    (SELECT COUNT(*) FROM customer c
      |     WHERE NOT EXISTS (SELECT 1 FROM nation n
      |                       WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans),
      |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
      |      UNION ALL SELECT * FROM r3)
      |SELECT relationship, n_child, n_orphans,
      |  ROUND(CAST(n_orphans AS DOUBLE) / n_child, 6) AS orphan_rate
      |FROM u ORDER BY relationship""".stripMargin

  /** SPEARMAN rank correlation between order value and order width
    * (lineitem count) — the monotone-association statistic that
    * survives the outliers and nonlinearity Pearson chokes on, and the
    * profiling question behind it ("do bigger orders have more lines,
    * monotonically?") is the join-fanout predictor [[qJoinFanout]]
    * summarizes marginally.
    *
    * Fully distributed and EXACT: each variable's tie-averaged midrank
    * comes from [[DistributedCumulate.runningTotals]] over its
    * distinct-value collapse, held as DOUBLED integers (2·mid = 2·
    * cum_before + t + 1 — the [[qMannWhitney]] identity), rows re-join
    * their ranks by value key, and Spearman ρ is Pearson over the
    * doubled ranks (scale-invariant), whose moments fold exactly in
    * DECIMAL(38,0)/HUGEINT. One fixed-shape double expression at the
    * end — no pooled sort, no window, engines agree bit-for-bit. */
  def qSpearman: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    val t = Tables(s, dir)
    val width = t.lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("v2"))
    val base = t.orders
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v1"))
      .join(width, col("o_orderkey") === col("l_orderkey"))
      .select(col("v1"), col("v2"))
    def ranks(vcol: String, out: String): DataFrame = {
      val c = base.groupBy(col(vcol).as("v")).agg(count(lit(1)).as("t"))
      DistributedCumulate.runningTotals(c, B, Seq(col("v")),
        Seq("t" -> "cum"), "rk")
        .select(col("v").as(vcol),
          (lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L)).as(out))
    }
    val ranked = base
      .join(ranks("v1", "r1"), "v1")
      .join(ranks("v2", "r2"), "v2")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("r1").cast("decimal(38,0)")).as("sx"),
      sum(col("r2").cast("decimal(38,0)")).as("sy"),
      // Doubled midranks reach ~2n, so each rank product is ~4n² and
      // wraps int64 past n ≈ 1.5·10⁹ rows (verdict-r14 #1). The cast
      // goes on the FIRST FACTOR, not the product: the multiply itself
      // must happen in decimal — casting a wrapped long is too late.
      sum(col("r1").cast("decimal(38,0)") * col("r1")).as("sxx"),
      sum(col("r2").cast("decimal(38,0)") * col("r2")).as("syy"),
      sum(col("r1").cast("decimal(38,0)") * col("r2")).as("sxy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("n"), round(cov / sqrt(vx * vy), 6).as("spearman_rho"))
  }

  val qSpearmanSql: String =
    """WITH width AS (SELECT l_orderkey, COUNT(*) AS v2
      |  FROM lineitem GROUP BY 1),
      |base AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v1, v2
      |  FROM orders o JOIN width w ON o.o_orderkey = w.l_orderkey),
      |c1 AS (SELECT v1 AS v, COUNT(*) AS t FROM base GROUP BY 1),
      |m1 AS (SELECT v AS v1,
      |    2*(CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) - t) + t + 1 AS r1
      |  FROM c1),
      |c2 AS (SELECT v2 AS v, COUNT(*) AS t FROM base GROUP BY 1),
      |m2 AS (SELECT v AS v2,
      |    2*(CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) - t) + t + 1 AS r2
      |  FROM c2),
      |r AS (SELECT r1, r2 FROM base JOIN m1 USING (v1) JOIN m2 USING (v2)),
      |m AS (SELECT COUNT(*) AS n,
      |    SUM(CAST(r1 AS HUGEINT)) AS sx, SUM(CAST(r2 AS HUGEINT)) AS sy,
      |    SUM(CAST(r1 AS HUGEINT)*r1) AS sxx,
      |    SUM(CAST(r2 AS HUGEINT)*r2) AS syy,
      |    SUM(CAST(r1 AS HUGEINT)*r2) AS sxy
      |  FROM r),
      |e AS (SELECT n,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
      |  FROM m)
      |SELECT n, ROUND(cov / SQRT(vx * vy), 6) AS spearman_rho
      |FROM e""".stripMargin

  /** BURSTINESS of event arrivals per type — Fano factor (σ²/μ over
    * daily counts) and the Goh–Barabási burstiness (σ−μ)/(σ+μ): a
    * collector flapping on and off shows the same daily MEAN as a
    * healthy one, but its variance explodes — this is the audit that
    * separates them (the [[qTvdDrift]]/[[qEntropyGroup]] family's
    * temporal member). One (type, day) fold, then exact integer
    * moments per type (counts and squared counts in int64), fixed-
    * shape double arithmetic at the end. Observed days only: a type
    * absent a whole day contributes no row — documented, determinstic
    * on both engines. */
  def qBurstiness: Q = (s, dir) => {
    val byDay = Tables(s, dir).events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c"))
    val m = byDay.groupBy(col("event_type"))
      // c·c wraps int64 at a ~3·10⁹-events/day cell (verdict-r14 #1):
      // decimal cast BEFORE the multiply, same rule as qSpearman.
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("q"))
    val mu = col("s").cast("double") / col("n_days")
    val varC = (col("q").cast("double") -
      col("s").cast("double") * col("s") / col("n_days")) / (col("n_days") - lit(1L))
    val sd = sqrt(varC)
    m.filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"),
        round(mu, 6).as("mean_daily"),
        round(varC / mu, 6).as("fano"),
        round((sd - mu) / (sd + mu), 6).as("burstiness"))
      .orderBy(col("event_type"))
  }

  val qBurstinessSql: String =
    """WITH bd AS (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
      |  FROM bd GROUP BY 1),
      |e AS (SELECT event_type, n_days,
      |    CAST(s AS DOUBLE) / n_days AS mu,
      |    (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
      |      / (n_days - 1) AS varc
      |  FROM m WHERE n_days > 1)
      |SELECT event_type, n_days, ROUND(mu, 6) AS mean_daily,
      |  ROUND(varc / mu, 6) AS fano,
      |  ROUND((SQRT(varc) - mu) / (SQRT(varc) + mu), 6) AS burstiness
      |FROM e ORDER BY event_type""".stripMargin

  /** THEIL index of order-value inequality, DECOMPOSED — the property
    * Gini structurally lacks ([[graft.ops.Analytic]]'s `q_gini` ranks
    * within nations but cannot split total inequality into
    * between-nation and within-nation parts; Theil T can, exactly):
    * one row per nation (within-nation T), plus `_between` and
    * `_total` rows. All three are per-row ln folds against broadcast
    * group moments — NO rank, NO cutpoint kernel, no window: the
    * map-side-combinable shape the rank-based Gini cannot have. Group
    * moments are exact int64; the per-group double folds ride the 6-dp
    * precedent. */
  def qTheilDecompose: Q = (s, dir) => {
    val t = Tables(s, dir)
    val o = t.orders.select(col("o_custkey"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
    val joined = o
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("g"), col("v"))
    val grp = joined.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"))
    val tot = grp.agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"))
    val within = joined.join(broadcast(grp), "g")
      .groupBy(col("g"), col("ng"))
      .agg(round(sum((col("v").cast("double") / col("sg")) *
        log(col("v").cast("double") * col("ng") / col("sg"))), 6).as("theil"))
      .select(col("g").as("scope"), col("ng").as("n_orders"), col("theil"))
    val between = grp.crossJoin(broadcast(tot))
      .agg(round(sum((col("sg").cast("double") / col("s")) *
        log(col("sg").cast("double") * col("n") /
          (col("s").cast("double") * col("ng")))), 6).as("theil"))
      .crossJoin(broadcast(tot))
      .select(lit("_between").as("scope"), col("n").as("n_orders"), col("theil"))
    val total = joined.crossJoin(broadcast(tot))
      .agg(round(sum((col("v").cast("double") / col("s")) *
        log(col("v").cast("double") * col("n") / col("s"))), 6).as("theil"))
      .crossJoin(broadcast(tot))
      .select(lit("_total").as("scope"), col("n").as("n_orders"), col("theil"))
    within.unionByName(between).unionByName(total).orderBy(col("scope"))
  }

  val qTheilDecomposeSql: String =
    """WITH o AS (SELECT o_custkey,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS v FROM orders),
      |j AS (SELECT n.n_name AS g, o.v
      |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |grp AS (SELECT g, COUNT(*) AS ng, CAST(SUM(v) AS BIGINT) AS sg
      |  FROM j GROUP BY g),
      |tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
      |        CAST(SUM(sg) AS BIGINT) AS s FROM grp),
      |w AS (SELECT g AS scope, ng AS n_orders,
      |    ROUND(SUM((CAST(v AS DOUBLE) / sg)
      |      * LN(CAST(v AS DOUBLE) * ng / sg)), 6) AS theil
      |  FROM j JOIN grp USING (g) GROUP BY g, ng),
      |bt AS (SELECT '_between' AS scope, t.n AS n_orders,
      |    ROUND(SUM((CAST(sg AS DOUBLE) / t.s)
      |      * LN(CAST(sg AS DOUBLE) * t.n / (CAST(t.s AS DOUBLE) * ng))), 6)
      |      AS theil
      |  FROM grp CROSS JOIN tot t GROUP BY t.n),
      |tt AS (SELECT '_total' AS scope, t.n AS n_orders,
      |    ROUND(SUM((CAST(v AS DOUBLE) / t.s)
      |      * LN(CAST(v AS DOUBLE) * t.n / t.s)), 6) AS theil
      |  FROM j CROSS JOIN tot t GROUP BY t.n)
      |SELECT scope, n_orders, theil FROM w
      |UNION ALL SELECT scope, n_orders, theil FROM bt
      |UNION ALL SELECT scope, n_orders, theil FROM tt
      |ORDER BY scope""".stripMargin

  /** Cramér's V — the effect-size companion of the test battery for
    * CATEGORICAL × CATEGORICAL association (is order priority
    * independent of order status, and how strongly not): χ² over the
    * full contingency grid normalized to [0,1] by N·(min(r,c)−1), so
    * pipelines can rank candidate stratification keys by association
    * strength rather than raw χ² (which grows with N).
    *
    * Shape: one map-side-combinable fold to the r×c cell grid, two
    * tiny re-aggregations for the margins, broadcast joins back — the
    * corpus is touched once. The ≤15-term χ² double fold carries
    * 1e-16-order noise vs the 6-dp output grain (the [[qTvdDrift]]
    * precedent); every input to each term is an exact int64. */
  def qCramersV: Q = (s, dir) => {
    val o = Tables(s, dir).orders
      .select(col("o_orderpriority").as("a"), col("o_orderstatus").as("b"))
    val cells = o.groupBy(col("a"), col("b")).agg(count(lit(1)).as("obs"))
    val rows = cells.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val colsT = cells.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val tot = cells.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    val e = col("rt").cast("double") * col("ct") / col("n")
    val term = (col("obs").cast("double") - e) * (col("obs").cast("double") - e) / e
    cells.join(broadcast(rows), "a").join(broadcast(colsT), "b")
      .crossJoin(broadcast(tot))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(term).as("chi2"))
      .select(col("n"), ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") /
          (col("n").cast("double") * (least(col("r"), col("c")) - lit(1L)))), 6)
          .as("cramers_v"))
  }

  val qCramersVSql: String =
    """WITH o AS (SELECT o_orderpriority AS a, o_orderstatus AS b FROM orders),
      |cells AS (SELECT a, b, COUNT(*) AS obs FROM o GROUP BY 1, 2),
      |r AS (SELECT a, CAST(SUM(obs) AS BIGINT) AS rt FROM cells GROUP BY a),
      |c AS (SELECT b, CAST(SUM(obs) AS BIGINT) AS ct FROM cells GROUP BY b),
      |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
      |        COUNT(DISTINCT a) AS nr, COUNT(DISTINCT b) AS nc FROM cells),
      |terms AS (SELECT t.n, t.nr, t.nc,
      |    (CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE) * ct / t.n)
      |      * (CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE) * ct / t.n)
      |      / (CAST(rt AS DOUBLE) * ct / t.n) AS term
      |  FROM cells JOIN r USING (a) JOIN c USING (b) CROSS JOIN t)
      |SELECT n, (nr - 1) * (nc - 1) AS dof,
      |  ROUND(SUM(term), 6) AS chi2,
      |  ROUND(SQRT(SUM(term)
      |    / (CAST(n AS DOUBLE) * (LEAST(nr, nc) - 1))), 6) AS cramers_v
      |FROM terms GROUP BY n, nr, nc""".stripMargin

  /** Distribution-CONCENTRATION profile per day — Shannon entropy,
    * normalized entropy, and the Herfindahl index of the event-type
    * mix: the within-day companion of [[qTvdDrift]]'s vs-corpus drift
    * (drift says "today differs from the corpus"; entropy collapse says
    * "today one type ate the feed" even when the corpus itself is
    * already skewed). One map-side-combinable (day × type) fold, then a
    * ≤|types|-term per-day fold — no windows, no joins beyond the tiny
    * day-total broadcast. The ln calls are the only libm arithmetic;
    * the 6-dp grain absorbs their cross-engine ulp. */
  def qEntropyGroup: Q = (s, dir) => {
    val ev = Tables(s, dir).events
      .select(to_date(col("ts")).as("d"), col("event_type"))
    val byDay = ev.groupBy(col("d"), col("event_type")).agg(count(lit(1)).as("c"))
    val dayTot = byDay.groupBy(col("d")).agg(sum(col("c")).as("nd"))
    byDay.join(broadcast(dayTot), "d")
      .select(col("d"), col("nd"),
        (col("c").cast("double") / col("nd")).as("p"))
      .groupBy(col("d"), col("nd"))
      .agg(count(lit(1)).as("n_types"),
        sum(-col("p") * log(col("p"))).as("h"),
        round(sum(col("p") * col("p")), 6).as("hhi"))
      .select(col("d"), col("nd").as("n_events"), col("n_types"),
        round(col("h"), 6).as("entropy"),
        round(when(col("n_types") === 1, lit(0.0))
          .otherwise(col("h") / log(col("n_types").cast("double"))), 6)
          .as("entropy_norm"),
        col("hhi"))
      .orderBy(col("d"))
  }

  val qEntropyGroupSql: String =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_type FROM events),
      |by_day AS (SELECT d, event_type, COUNT(*) AS c FROM ev GROUP BY 1, 2),
      |day_tot AS (SELECT d, CAST(SUM(c) AS BIGINT) AS nd FROM by_day GROUP BY 1),
      |p AS (SELECT b.d, t.nd, CAST(b.c AS DOUBLE) / t.nd AS p
      |  FROM by_day b JOIN day_tot t USING (d)),
      |agg AS (SELECT d, nd, COUNT(*) AS n_types,
      |    SUM(-p * LN(p)) AS h, ROUND(SUM(p * p), 6) AS hhi
      |  FROM p GROUP BY d, nd)
      |SELECT d, nd AS n_events, n_types, ROUND(h, 6) AS entropy,
      |  ROUND(CASE WHEN n_types = 1 THEN 0.0
      |        ELSE h / LN(CAST(n_types AS DOUBLE)) END, 6) AS entropy_norm,
      |  hhi
      |FROM agg ORDER BY d""".stripMargin

  /** Late-arrival audit — the batch formulation of a streaming
    * WATERMARK health check: an event is LATE when something with a
    * newer event time had already arrived more than `tol` before it
    * (arrival order = event_id, the ingest sequence). Per event-day:
    * how many events a `withWatermark(1 hour)` streaming job would
    * have dropped, their share, and the worst lateness — the number
    * that tells you whether the streaming twin of a batch pipeline
    * can use a 1-hour watermark or needs a bigger allowed-lateness
    * budget.
    *
    * Shape: the naive formulation is MAX(ts) OVER (ORDER BY event_id
    * ROWS … 1 PRECEDING) — one task sorts the whole ingest log. Here
    * [[DistributedCumulate.runningMaxExclusive]] computes the same
    * exclusive prefix max over range buckets (local windows partitioned
    * by bucket id + a broadcast of per-bucket maxima), then one
    * map-side-combinable per-day fold. Integer microseconds end to
    * end. */
  def qLateEvents: Q = (s, dir) => {
    val B = s.sessionState.conf.numShufflePartitions
    val tolUs = 3600L * 1000000L
    // Scan-direct kernel input, NO cut by design (r17 call-site audit):
    // the upstream is a bare columnar projection of the event log, so
    // the sketch branch's re-scan beats materializing the full log —
    // the documented exception in [[Lineage]].
    val e = Tables(s, dir).events
      .select(col("event_id"), to_date(col("ts")).as("d"),
        unix_micros(col("ts")).as("v"))
    val wm = DistributedCumulate.runningMaxExclusive(
      e, B, Seq(col("event_id")), Seq("v" -> "wm"), "rk")
    val lateUs = when(col("wm") - col("v") > tolUs, col("wm") - col("v"))
    wm.groupBy(col("d"))
      .agg(count(lit(1)).as("n_events"),
        count(lateUs).as("n_late"),
        coalesce(max(lateUs), lit(0L)).as("max_late_us"))
      .select(col("d"), col("n_events"), col("n_late"),
        round(col("n_late").cast("double") / col("n_events"), 6).as("late_share"),
        col("max_late_us"))
      .orderBy(col("d"))
  }

  val qLateEventsSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS DATE) AS d, epoch_us(ts) AS v
      |  FROM events),
      |w AS (SELECT d, v,
      |    MAX(v) OVER (ORDER BY event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
      |  FROM e),
      |l AS (SELECT d, v,
      |    CASE WHEN wm - v > 3600000000 THEN wm - v END AS late_us
      |  FROM w)
      |SELECT d, COUNT(*) AS n_events, COUNT(late_us) AS n_late,
      |  ROUND(CAST(COUNT(late_us) AS DOUBLE) / COUNT(*), 6) AS late_share,
      |  CAST(COALESCE(MAX(late_us), 0) AS BIGINT) AS max_late_us
      |FROM l GROUP BY d ORDER BY d""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_interarrival_median" -> qInterarrivalMedian,
    "q_trimmed_mean_group" -> qTrimmedMeanGroup,
    "q_ks_drift"       -> qKsDrift,
    "q_mannwhitney"    -> qMannWhitney,
    "q_welch_ttest"    -> qWelchTtest,
    "q_anova_groups"   -> qAnovaGroups,
    "q_cramers_v"      -> qCramersV,
    "q_burstiness"     -> qBurstiness,
    "q_theil_decompose" -> qTheilDecompose,
    "q_spearman"       -> qSpearman,
    "q_dq_referential" -> qDqReferential,
    "q_entropy_group"  -> qEntropyGroup,
    "q_late_events"    -> qLateEvents,
    "q_group_quantiles" -> qGroupQuantiles,
    "q_mad_group"      -> qMadGroup,
    "q_weighted_median_group" -> qWeightedMedianGroup,
    "q_join_fanout"    -> qJoinFanout,
    "q_tvd_drift"      -> qTvdDrift,
    "q_skew_stats"     -> qSkewStats,
    "q_profile"        -> qProfileOrders,
    "q_profile_approx" -> qProfileOrdersApprox,
    "q_dq_checks"      -> qDqChecks,
    "q_dq_benford"     -> qDqBenford)
  val oracles: Map[String, String] = Map(
    "q_interarrival_median" -> qInterarrivalMedianSql,
    "q_trimmed_mean_group" -> qTrimmedMeanGroupSql,
    "q_ks_drift"       -> qKsDriftSql,
    "q_mannwhitney"    -> qMannWhitneySql,
    "q_welch_ttest"    -> qWelchTtestSql,
    "q_anova_groups"   -> qAnovaGroupsSql,
    "q_cramers_v"      -> qCramersVSql,
    "q_burstiness"     -> qBurstinessSql,
    "q_theil_decompose" -> qTheilDecomposeSql,
    "q_spearman"       -> qSpearmanSql,
    "q_dq_referential" -> qDqReferentialSql,
    "q_entropy_group"  -> qEntropyGroupSql,
    "q_late_events"    -> qLateEventsSql,
    "q_group_quantiles" -> qGroupQuantilesSql,
    "q_mad_group"      -> qMadGroupSql,
    "q_weighted_median_group" -> qWeightedMedianGroupSql,
    "q_join_fanout"    -> qJoinFanoutSql,
    "q_tvd_drift"      -> qTvdDriftSql,
    "q_skew_stats"     -> qSkewStatsSql,
    "q_profile"        -> qProfileOrdersSql,
    "q_profile_approx" -> qProfileOrdersApproxSql,
    "q_dq_checks"      -> qDqChecksSql,
    "q_dq_benford"     -> qDqBenfordSql)
}
