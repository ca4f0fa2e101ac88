package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The UDF capability surface (SURVEY.md §2.3 "UDF surface"): a scalar UDF,
  * a typed `Aggregator`, and their query entries.
  *
  * Position on the customization ladder: built-in `functions._` >> custom
  * codegen `Expression` ([[DotProduct]]) >> scalar UDF (boxing, no codegen,
  * opaque to the optimizer — filters can't push through it). The scalar UDF
  * here exists to prove the surface, with the same logic intentionally
  * expressible as a CASE for the oracle; real hot paths use the first two
  * rungs. The `Aggregator` is the typed heap-style reduction (bounded
  * per-group state, map-side partial merge — the right shape for top-k at
  * scale, where sort-then-limit per group would shuffle everything).
  */
object Udfs {

  /** Scalar UDF: price banding. */
  val priceBand = udf((p: Double) =>
    if (p < 50000) "low" else if (p < 200000) "mid" else "high")

  /** Typed Aggregator: bounded top-k (descending) of a double value —
    * constant-size buffer, associative merge, no per-group sort shuffle. */
  case class TopKBuf(values: Seq[Double])
  class TopK(k: Int) extends Aggregator[Double, TopKBuf, Seq[Double]] {
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    // O(1) typical / O(k) worst-case bounded insertion: a full buffer
    // rejects sub-min values without copying, otherwise the value is
    // spliced at its descending-order position. A per-element full sort
    // (O(k log k)) is the wrong shape to copy at k=1000.
    override def reduce(buf: TopKBuf, v: Double): TopKBuf = {
      val vs = buf.values
      if (vs.length >= k && v <= vs.last) buf
      else {
        val i = vs.indexWhere(_ < v)
        val spliced = if (i < 0) vs :+ v else (vs.take(i) :+ v) ++ vs.drop(i)
        TopKBuf(spliced.take(k))
      }
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.values ++ b.values).sorted(Ordering[Double].reverse).take(k))
    override def finish(r: TopKBuf): Seq[Double] = r.values
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  type Q = (SparkSession, String) => DataFrame

  /** Scalar-UDF query: band orders by total price, count per band. */
  def qUdfScalar: Q = (s, dir) => {
    Tables(s, dir).orders
      .select(priceBand(col("o_totalprice")).as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("band"))
  }

  val qUdfScalarSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 200000 THEN 'mid'
      |            ELSE 'high' END AS band, COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin

  /** Typed-Aggregator query: top-3 order totals per customer. Emitted as
    * three scalar columns (not an array) — the driver's compare sorts rows
    * with pandas, which cannot order array cells; `element_at` past the
    * buffer end is NULL on both sides. */
  def qAggTopK: Q = (s, dir) => {
    import org.apache.spark.sql.functions.udaf
    val top3 = udaf(new TopK(3))
    Tables(s, dir).orders
      .groupBy(col("o_custkey"))
      .agg(top3(col("o_totalprice")).as("top3"))
      .select(col("o_custkey"),
        try_element_at(col("top3"), lit(1)).as("top1"),
        try_element_at(col("top3"), lit(2)).as("top2"),
        try_element_at(col("top3"), lit(3)).as("top3"))
      .orderBy(col("o_custkey"))
  }

  val qAggTopKSql: String =
    """SELECT o_custkey, l[1] AS top1, l[2] AS top2, l[3] AS top3
      |FROM (SELECT o_custkey,
      |        list(o_totalprice ORDER BY o_totalprice DESC, o_orderkey) AS l
      |      FROM orders GROUP BY o_custkey)
      |ORDER BY o_custkey""".stripMargin

  /** Native `TypedImperativeAggregate` query ([[TopKPairs]]): top-3
    * orders by total price per order priority, exploded back to rows
    * (array cells crash the driver's pandas row-sort). The tie rule
    * (score desc, payload asc) matches the oracle's ROW_NUMBER ordering
    * exactly, so the hash comparison is strict. */
  def qTopKTypedAgg: Q = (s, dir) => {
    Tables(s, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(call_function("graft_topk",
        col("o_totalprice"), col("o_orderkey"), lit(3)).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(
        col("o_orderpriority"),
        (col("pos") + 1).cast("long").as("rk"),
        col("p.payload").as("o_orderkey"),
        col("p.score").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  val qTopKTypedAggSql: String =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin

  /** Approximate aggregates: HLL++ distinct + quantile sketch, with a
    * PARTIAL oracle. Sketch values are engine-specific (DuckDB can't
    * reproduce Spark's HLL++/GK numbers), but sketch ACCURACY is
    * deterministic: both `approx_count_distinct` (fixed-seed HLL++) and
    * `percentile_approx` are pure functions of the data, so
    * |approx − exact| / exact ≤ tol is a stable boolean the oracle can
    * assert as literal TRUE. The exact companions hash-match outright
    * (same formulation as q_percentiles). rsd=0.02 keeps HLL++ well
    * inside the 5% gate. */
  def qApprox: Q = (s, dir) => {
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_p50"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        col("exact_p50"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("approx_parts_ok"),
        (abs(col("approx_p50") - col("exact_p50")) <=
          abs(col("exact_p50")) * 0.05).as("approx_p50_ok"))
      .orderBy(col("l_returnflag"))
  }

  val qApproxSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  quantile_cont(l_extendedprice, 0.5) AS exact_p50,
      |  TRUE AS approx_parts_ok,
      |  TRUE AS approx_p50_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Heavy hitters via Misra–Gries sketch + exact recount ([[FrequentItems]]).
    *
    * The 100 TB shape: pass 1 aggregates the WHOLE fact table down to one
    * bounded sketch (cap counters per map task cross the exchange — not
    * one row per distinct key, of which there may be billions); pass 2
    * broadcast-semi-joins the tiny candidate set back against the fact
    * table and recounts exactly, so the final filter runs on true counts.
    * MG guarantees candidates ⊇ {items with count > n/(cap+1)}, and the
    * query's threshold n/1500 > n/1501 sits inside that guarantee — the
    * result is therefore EXACTLY the heavy set, deterministic under any
    * partitioning, and hash-equal to the oracle's full GROUP BY … HAVING. */
  def qHeavyHitters: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
    val candidates = li
      .agg(call_function("graft_freq_items", col("l_partkey"), lit(1500)).as("sketch"))
      .select(explode(col("sketch")).as("c"))
      .select(col("c.item").as("cand_key"))
    val total = li.agg(count(lit(1)).as("n_total"))
    li.join(broadcast(candidates), col("l_partkey") === col("cand_key"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") > col("n_total") / lit(1500.0))
      .select(col("l_partkey").as("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }

  val qHeavyHittersSql: String =
    """SELECT l_partkey AS item, COUNT(*) AS cnt
      |FROM lineitem GROUP BY 1
      |HAVING COUNT(*) > (SELECT COUNT(*) FROM lineitem) / 1500.0
      |ORDER BY cnt DESC, item""".stripMargin

  /** Re-aggregatable distinct-count sketches (Apache DataSketches HLL):
    * build one sketch per source, then MERGE the binary sketches into the
    * global count — no second pass over the data. This is the 100 TB
    * pattern for distinct counts across rollup levels: per-partition/
    * per-day sketches are tiny, persist as bytes, and any coarser rollup
    * (week, global, any dimension subset) is a sketch union instead of a
    * re-scan — what `countDistinct` fundamentally cannot do (distinct
    * counts don't add). Oracle treatment = q_approx_agg: exact companions
    * hash-match outright; sketch ACCURACY is asserted as a deterministic
    * within-2% boolean (HLL lgk=12 ⇒ ~1.6% RSE; the sketch is a pure
    * function of the data, so the boolean is stable). */
  def qHllRollup: Q = (s, dir) => {
    val docs = Tables(s, dir).documents
    val per = docs.groupBy(col("source")).agg(
      hll_sketch_agg(col("doc_id")).as("sk"),
      countDistinct(col("doc_id")).as("exact_ids"))
    val perOut = per.select(
      col("source"), col("exact_ids"),
      (abs(hll_sketch_estimate(col("sk")) - col("exact_ids")) <=
        col("exact_ids") * 0.02).as("approx_ok"))
    val globalExact = docs.agg(countDistinct(col("doc_id")).as("g_exact"))
    val globalOut = per.agg(hll_union_agg(col("sk")).as("sk"))
      .crossJoin(broadcast(globalExact))
      .select(
        lit("__all__").as("source"), col("g_exact").as("exact_ids"),
        (abs(hll_sketch_estimate(col("sk")) - col("g_exact")) <=
          col("g_exact") * 0.02).as("approx_ok"))
    perOut.unionByName(globalOut).orderBy(col("source"))
  }

  val qHllRollupSql: String =
    """SELECT source, COUNT(DISTINCT doc_id) AS exact_ids, TRUE AS approx_ok
      |FROM documents GROUP BY source
      |UNION ALL
      |SELECT '__all__', COUNT(DISTINCT doc_id), TRUE FROM documents
      |ORDER BY source""".stripMargin

  /** Re-aggregatable QUANTILE sketches — the [[qHllRollup]] story for
    * percentiles. Quantiles, like distinct counts, don't add: per-month
    * medians cannot be combined into a global median, so naive rollups
    * re-scan raw data per level. The mergeable sketch here is a
    * deterministic bottom-k sample: keep the k rows whose affine row-id
    * hash is smallest (a uniform sample, since the hash is independent of
    * the value), carried as (hash, value) pairs in [[TopKPairs]]'s bounded
    * binary buffer (score = −hash makes top-k = bottom-k). Mergeability is
    * exact — the global bottom-k of a union is the bottom-k of the
    * per-source bottom-k's — so per-month sketches of ~k rows union into
    * any coarser rollup with no raw re-scan, and the estimate is the order
    * statistic of the merged sample (error ~1/√k on quantile rank).
    *
    * Unlike HLL the construction is fully deterministic (the hash is a
    * pure function of the row id, ties break on value), so the oracle
    * mirrors it row-for-row and the gate is an EXACT hash match, not a
    * tolerance boolean. Values travel as integer cents — order statistics
    * stay exact, and the final `/100.0` is the same single IEEE op in both
    * engines; Spark's long cast TRUNCATES the `price*100` product while
    * DuckDB's CAST rounds, so the oracle mirrors the truncation with
    * `trunc()` (values are positive) — on this data the two differ on ~5%
    * of rows, enough to flip an order statistic. The row-id hash pre-reduces `uid % M` before the affine
    * multiply so the product stays < 2⁶³ for any BIGINT uid — no overflow
    * at 100 TB key ranges (and in production `xxhash64` is the drop-in). */
  def qQuantileSketch: Q = (s, dir) => {
    val k = 2048
    val M = 2147483647L // 2^31 − 1, prime
    val pts = Tables(s, dir).lineitem.select(
      date_trunc("month", col("l_shipdate")).as("month"),
      (((col("l_orderkey") * 8 + col("l_linenumber")) % M) * 2654435761L % M)
        .as("h"),
      (col("l_extendedprice") * 100).cast("long").as("cents"))
    // Build: one bounded sketch per month — map-side partial merges, ≤k
    // (hash, cents) pairs per group ever cross the exchange.
    val monthly = pts.groupBy(col("month")).agg(
      call_function("graft_topk",
        -col("h").cast("double"), col("cents"), lit(k)).as("sk"))
    // Merge: union the ~months×k sketch rows into the global bottom-k.
    // Raw lineitem is NOT rescanned past the build stage.
    val merged = monthly.select(explode(col("sk")).as("e"))
      .agg(call_function("graft_topk",
        col("e.score"), col("e.payload"), lit(k)).as("sk"))
    val sample = merged.select(
      array_sort(transform(col("sk"), x => x.getField("payload"))).as("cs"),
      size(col("sk")).as("n"))
    def q(p: Double, name: String): Column =
      (element_at(col("cs"), ceil(lit(p) * col("n")).cast("int")) / 100.0)
        .as(name)
    sample.select(q(0.5, "p50_est"), q(0.9, "p90_est"), q(0.99, "p99_est"),
      col("n").as("sample_n"))
  }

  val qQuantileSketchSql: String =
    """WITH pts AS (
      |  SELECT date_trunc('month', l_shipdate) AS month,
      |         (((l_orderkey * 8 + l_linenumber) % 2147483647)
      |           * 2654435761) % 2147483647 AS h,
      |         CAST(trunc(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |monthly AS (
      |  SELECT month, h, cents,
      |         row_number() OVER (PARTITION BY month ORDER BY h, cents) AS rn
      |  FROM pts),
      |merged AS (
      |  SELECT h, cents, row_number() OVER (ORDER BY h, cents) AS rn2
      |  FROM monthly WHERE rn <= 2048),
      |samp AS (
      |  SELECT cents, row_number() OVER (ORDER BY cents) AS r,
      |         count(*) OVER () AS n
      |  FROM merged WHERE rn2 <= 2048)
      |SELECT
      |  max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT) THEN cents END)
      |    / 100.0 AS p50_est,
      |  max(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT) THEN cents END)
      |    / 100.0 AS p90_est,
      |  max(CASE WHEN r = CAST(ceil(0.99 * n) AS BIGINT) THEN cents END)
      |    / 100.0 AS p99_est,
      |  CAST(max(n) AS INT) AS sample_n
      |FROM samp""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_udf_scalar"     -> qUdfScalar,
    "q_agg_topk"       -> qAggTopK,
    "q_topk_typed_agg" -> qTopKTypedAgg,
    "q_approx_agg"     -> qApprox,
    "q_heavy_hitters"  -> qHeavyHitters,
    "q_hll_rollup"     -> qHllRollup,
    "q_quantile_sketch" -> qQuantileSketch,
  )

  val oracles: Map[String, String] = Map(
    "q_udf_scalar"     -> qUdfScalarSql,
    "q_agg_topk"       -> qAggTopKSql,
    "q_topk_typed_agg" -> qTopKTypedAggSql,
    "q_approx_agg"     -> qApproxSql,
    "q_heavy_hitters"  -> qHeavyHittersSql,
    "q_hll_rollup"     -> qHllRollupSql,
    "q_quantile_sketch" -> qQuantileSketchSql,
  )
}
