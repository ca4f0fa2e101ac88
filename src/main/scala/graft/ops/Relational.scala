package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Exact._

/** Core relational capability surface (SURVEY.md §2.3): scans, projection,
  * filter, equi/non-equi joins, hash aggregation, rollup/cube, set ops,
  * sort/limit, scalar functions.
  *
  * Every query is a pure LogicalPlan builder — no collect(), no driver-side
  * loops — so Catalyst gets the whole plan: filters reach the parquet scan
  * as PushedFilters, column pruning shrinks ReadSchema, and AQE is free to
  * re-plan shuffles at runtime. Joins against bounded dims use explicit
  * broadcast hints (see [[graft.sources.Tables]]); fact-fact joins
  * (orders ⋈ lineitem) stay as shuffled hash/sort-merge joins on the join
  * key, which is the right shape at 100 TB — both sides hash-partition on
  * o_orderkey/l_orderkey and nothing materializes on the driver.
  *
  * Determinism contract: every query ends in a total-order sort (group keys
  * or a unique key) and all double reductions go through [[graft.functions.Exact]]
  * so results hash-match the single-threaded DuckDB oracle at any
  * parallelism.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: partial+final hash agg, 8 aggregates. */
  def q01PricingSummary: Q = (s, dir) => {
    val l = Tables(s, dir).lineitem
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlQsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS sum_disc_price,
       |  ${sqlQsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + projection: predicate pushdown + column pruning
    * (TPC-H Q6 shape). The scan should read exactly 4 columns. */
  def q06ForecastRevenue: Q = (s, dir) => {
    val l = Tables(s, dir).lineitem
    l.filter(col("l_shipdate") >= lit("1996-01-01") &&
             col("l_shipdate") < lit("1997-01-01") &&
             col("l_discount").between(0.03, 0.07) &&
             col("l_quantity") < 24)
      .agg(qsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n"))
  }

  val q06Sql: String =
    s"""SELECT ${sqlQsum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** 3-way join fact⋈fact⋈dim + agg + top-N (TPC-H Q3 shape).
    * customer is filtered then joined; orders⋈lineitem is the shuffle join
    * on orderkey — co-partitioned, no broadcast of a fact. */
  def q03ShippingPriority: Q = (s, dir) => {
    val t = Tables(s, dir)
    val c = t.customer.filter(col("c_mktsegment") === "BUILDING")
    val o = t.orders.filter(col("o_orderdate") < lit("1998-01-01"))
    val l = t.lineitem.filter(col("l_shipdate") > lit("1996-03-15"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  val q03Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${sqlQsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin

  /** Left-semi join (EXISTS): orders with at least one late lineitem. */
  def q04OrderPriority: Q = (s, dir) => {
    val t = Tables(s, dir)
    val o = t.orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
                            col("o_orderdate") < lit("1997-01-01"))
    val l = t.lineitem.select(col("l_orderkey"))
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** 5-way star join through two broadcast dims (TPC-H Q5 shape). */
  def q05LocalSupplier: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(t.supplierDim,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(t.nationDim, col("s_nationkey") === col("n_nationkey"))
      .join(t.regionDim, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(qsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("n_name"))
  }

  val q05Sql: String =
    s"""SELECT n_name,
       |  ${sqlQsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def qAntiCustomersNoOrders: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 300000.0).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val qAntiSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Outer join with null-producing side + conditional agg. */
  def qOuterOrderCounts: Q = (s, dir) => {
    val t = Tables(s, dir)
    val perCust = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    t.customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val qOuterSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COALESCE(cnt, 0) AS c_count
      |  FROM customer LEFT JOIN
      |    (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
      |  ON c_custkey = o_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Rollup: multi-level aggregate with explicit NULLS FIRST total order. */
  def qRollupRevenue: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  val qRollupSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${sqlSum("o_totalprice")} AS total
       |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Cube over two dims. */
  def qCubeQuantity: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val qCubeSql: String =
    s"""SELECT l_returnflag, l_linestatus, ${sqlSum("l_quantity")} AS qty, COUNT(*) AS n
       |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Distinct aggregation: count(distinct) alongside plain aggregates. */
  def qDistinctAgg: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
           countDistinct(col("l_suppkey")).as("distinct_supps"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val qDistinctAggSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
      |  COUNT(DISTINCT l_suppkey) AS distinct_supps, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set operations: union / intersect / except with distinct semantics. */
  def qSetOps: Q = (s, dir) => {
    val t = Tables(s, dir)
    // Both distinct sets feed two set ops each; persist so the orders scan
    // + distinct shuffle runs once per set, not once per consumer.
    val buyers  = t.orders.select(col("o_custkey").as("custkey")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val big     = t.orders.filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey").as("custkey")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nonBig  = buyers.except(big)                       // EXCEPT
    val overlap = buyers.intersect(big)                    // INTERSECT
    nonBig.withColumn("kind", lit("small_only"))
      .union(overlap.withColumn("kind", lit("has_big")))   // UNION ALL
      .orderBy(col("kind"), col("custkey"))
  }

  val qSetOpsSql: String =
    """SELECT * FROM (
      |  SELECT custkey, 'small_only' AS kind FROM (
      |    SELECT DISTINCT o_custkey AS custkey FROM orders
      |    EXCEPT
      |    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000.0)
      |  UNION ALL
      |  SELECT custkey, 'has_big' AS kind FROM (
      |    SELECT DISTINCT o_custkey AS custkey FROM orders
      |    INTERSECT
      |    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000.0))
      |ORDER BY kind, custkey""".stripMargin

  /** Scalar function battery: string/date/conditional functions that must
    * agree exactly with ANSI SQL semantics. */
  def qScalarFns: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.part
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_size") < 10, "S").when(col("p_size") < 30, "M").otherwise("L").as("size_class"),
        round(col("p_retailprice") * 1.1, 2).as("uplift"),
        abs(col("p_size") - 25).as("size_dist"))
      .orderBy(col("p_partkey"))
  }

  val qScalarFnsSql: String =
    """SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
      |  LENGTH(p_name) AS name_len, SUBSTRING(p_name, 1, 5) AS name_pfx,
      |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
      |  CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_class,
      |  ROUND(p_retailprice * 1.1, 2) AS uplift,
      |  ABS(p_size - 25) AS size_dist
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Null-semantics battery — the SQL null rules every aggregate consumer
    * silently depends on, pinned cross-engine: COUNT(*) vs null-skipping
    * COUNT(col), DISTINCT ignoring nulls, SUM over a nullable column,
    * CASE-without-ELSE producing nulls, MAX over a possibly-empty set
    * rescued by COALESCE. Nullable inputs are derived deterministically
    * from raw columns so both engines see identical null placement. */
  def qNullSemantics: Q = (s, dir) => {
    val t = Tables(s, dir).lineitem
    val d = t.select(
      (col("l_orderkey") % 3).as("grp"),
      when(col("l_quantity") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity")).as("q7"),
      when(col("l_tax") > 0.05, col("l_tax")).as("hi_tax"))
    d.groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("q7")).as("n_q7"),
        (count(lit(1)) - count(col("q7"))).as("n_null_q7"),
        countDistinct(col("q7")).as("nd_q7"),
        dsum(col("q7")).as("sum_q7"),
        coalesce(max(col("hi_tax")), lit(-1.0)).as("max_hitax"))
      .orderBy(col("grp"))
  }

  val qNullSemanticsSql: String =
    s"""SELECT grp, COUNT(*) AS n_rows, COUNT(q7) AS n_q7,
       |  COUNT(*) - COUNT(q7) AS n_null_q7,
       |  COUNT(DISTINCT q7) AS nd_q7,
       |  ${sqlSum("q7")} AS sum_q7,
       |  COALESCE(MAX(hi_tax), -1.0) AS max_hitax
       |FROM (SELECT l_orderkey % 3 AS grp,
       |        CASE WHEN l_quantity % 7 = 0 THEN NULL ELSE l_quantity END AS q7,
       |        CASE WHEN l_tax > 0.05 THEN l_tax END AS hi_tax
       |      FROM lineitem)
       |GROUP BY grp ORDER BY grp""".stripMargin

  /** Higher-order array function battery over the documents word lists:
    * filter / exists / aggregate (fold) / transform / distinct+sort /
    * slice / element access — the lambda surface that keeps per-row
    * collection logic inside codegen instead of a UDF. The fold sums
    * integers (order-insensitive), distinct goes through a sort before
    * any ordered use, so every column is engine-portable. */
  def qArrayFns: Q = (s, dir) => {
    val d = Tables(s, dir).documents.withColumn("wl", split(col("text"), " "))
    d.select(
        col("doc_id"),
        size(col("wl")).cast("long").as("n_words"),
        size(filter(col("wl"), w => length(w) > 4)).cast("long").as("n_long"),
        exists(col("wl"), w => w === lit("spark")).as("has_spark"),
        aggregate(col("wl"), lit(0L), (acc, w) => acc + length(w).cast("long")).as("chars_sum"),
        array_join(slice(array_sort(array_distinct(col("wl"))), 1, 3), "|").as("first3_uniq"),
        element_at(col("wl"), 1).as("first_word"),
        element_at(col("wl"), -1).as("last_word"))
      .orderBy(col("doc_id"))
  }

  val qArrayFnsSql: String =
    """SELECT doc_id,
      |  LEN(wl) AS n_words,
      |  LEN(list_filter(wl, w -> LEN(w) > 4)) AS n_long,
      |  list_contains(wl, 'spark') AS has_spark,
      |  CAST(list_sum(list_transform(wl, w -> LEN(w))) AS BIGINT) AS chars_sum,
      |  array_to_string((list_sort(list_distinct(wl)))[1:3], '|') AS first3_uniq,
      |  wl[1] AS first_word,
      |  wl[-1] AS last_word
      |FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Date/time function battery over orders. */
  def qDateFns: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_1999"))
      .orderBy(col("o_orderkey"))
      .limit(1000)
  }

  val qDateFnsSql: String =
    """SELECT o_orderkey,
      |  CAST(YEAR(o_orderdate) AS INTEGER) AS y,
      |  CAST(MONTH(o_orderdate) AS INTEGER) AS m,
      |  CAST(DAY(o_orderdate) AS INTEGER) AS d,
      |  CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(DATE '1999-01-01' - CAST(o_orderdate AS DATE) AS INTEGER) AS days_to_1999
      |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin

  /** Theta (range) join: lineitem priced within a band around the part's
    * retail price. Non-equi condition on top of an equi key keeps it a hash
    * join with residual — NOT a nested-loop cross product. */
  def qRangeJoin: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.partDim,
        col("l_partkey") === col("p_partkey") &&
        col("l_extendedprice") >= col("p_retailprice") * 0.5 &&
        col("l_extendedprice") <= col("p_retailprice") * 50.0)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
      .orderBy(col("p_brand"))
  }

  val qRangeJoinSql: String =
    s"""SELECT p_brand, COUNT(*) AS n, ${sqlSum("l_extendedprice")} AS total
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |  AND l_extendedprice >= p_retailprice * 0.5
       |  AND l_extendedprice <= p_retailprice * 50.0
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Full outer join: null-producing on BOTH sides. High-value customers
    * vs high-volume buyers by custkey. */
  def qFullOuter: Q = (s, dir) => {
    val t = Tables(s, dir)
    val rich = t.customer.filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    val busy = t.orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
    rich.join(busy, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_orders"))
      .orderBy(col("custkey"))
  }

  val qFullOuterSql: String =
    """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0) r
      |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      |           GROUP BY o_custkey HAVING COUNT(*) >= 15) b
      |ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  /** Right-outer join: every order kept, customer side nullable (the
    * mirror of the usual left join — exercises the distinct join type). */
  def qRightOuter: Q = (s, dir) => {
    val t = Tables(s, dir)
    val richCust = t.customer.filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_name"))
    richCust.join(t.orders, col("c_custkey") === col("o_custkey"), "right_outer")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), count(col("c_custkey")).as("n_rich"))
      .orderBy(col("o_orderpriority"))
  }

  val qRightOuterSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders, COUNT(c_custkey) AS n_rich
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0) c
      |RIGHT JOIN orders ON c_custkey = o_custkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Intentional cross join of two constant-size dims (region × nation =
    * 125 rows) — the one place a cartesian product is the right plan. */
  def qCrossJoin: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.region.select(col("r_name"))
      .crossJoin(t.nation.select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))
  }

  val qCrossJoinSql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_right_outer_join"    -> qRightOuter,
    "q_cross_join_dims"     -> qCrossJoin,
    "q_full_outer_join"     -> qFullOuter,
    "q01_pricing_summary"   -> q01PricingSummary,
    "q03_shipping_priority" -> q03ShippingPriority,
    "q04_order_priority"    -> q04OrderPriority,
    "q05_local_supplier"    -> q05LocalSupplier,
    "q06_forecast_revenue"  -> q06ForecastRevenue,
    "q_anti_join"           -> qAntiCustomersNoOrders,
    "q_outer_join_counts"   -> qOuterOrderCounts,
    "q_rollup_revenue"      -> qRollupRevenue,
    "q_cube_quantity"       -> qCubeQuantity,
    "q_distinct_agg"        -> qDistinctAgg,
    "q_set_ops"             -> qSetOps,
    "q_scalar_fns"          -> qScalarFns,
    "q_array_fns"           -> qArrayFns,
    "q_null_semantics"      -> qNullSemantics,
    "q_date_fns"            -> qDateFns,
    "q_range_join"          -> qRangeJoin,
  )

  val oracles: Map[String, String] = Map(
    "q_right_outer_join"    -> qRightOuterSql,
    "q_cross_join_dims"     -> qCrossJoinSql,
    "q_full_outer_join"     -> qFullOuterSql,
    "q01_pricing_summary"   -> q01Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_order_priority"    -> q04Sql,
    "q05_local_supplier"    -> q05Sql,
    "q06_forecast_revenue"  -> q06Sql,
    "q_anti_join"           -> qAntiSql,
    "q_outer_join_counts"   -> qOuterSql,
    "q_rollup_revenue"      -> qRollupSql,
    "q_cube_quantity"       -> qCubeSql,
    "q_distinct_agg"        -> qDistinctAggSql,
    "q_set_ops"             -> qSetOpsSql,
    "q_scalar_fns"          -> qScalarFnsSql,
    "q_array_fns"           -> qArrayFnsSql,
    "q_null_semantics"      -> qNullSemanticsSql,
    "q_date_fns"            -> qDateFnsSql,
    "q_range_join"          -> qRangeJoinSql,
  )
}
