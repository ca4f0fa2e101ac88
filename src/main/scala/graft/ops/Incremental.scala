package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.{dsum, sqlSum}
import graft.sources.Tables

/** Incremental view maintenance for JOIN views — the delta algebra that
  * keeps a materialized join (or aggregate-over-join) current without
  * rescanning history:
  *
  *   (O ∪ ΔO) ⋈ (L ∪ ΔL)
  *     = O⋈L  ∪  ΔO⋈(L ∪ ΔL)  ∪  O⋈ΔL
  *
  * so the maintained view advances by exactly two DELTA joins — each with
  * one small side — plus a partial-state fold (sums/counts add, the same
  * algebra [[graft.streaming.RollupMaintenance]] applies to single-table
  * rollups and [[graft.plans.MaterializedRollupRewrite]] exploits
  * downward).
  *
  * Scale economics: at 100 TB the stored view and the base tables never
  * rescan — the maintenance cost is O(Δ) joins (a day's arrivals against
  * the big side, broadcast when the delta is small, shuffled-on-key
  * otherwise) plus O(summary) for the re-aggregation. The full-join
  * recompute this replaces is the single most expensive recurring job in
  * a warehouse. Correctness needs the deltas DISJOINT from the old
  * snapshots (append-only feeds guarantee it; upserts route through
  * [[Mutation.qMergeUpsert]] first).
  *
  * The oracle computes the view from scratch over the full tables, so the
  * gate proves the incremental path reproduces the batch answer exactly —
  * including the decimal-exact revenue sums (partials re-fold through the
  * same fixed-point representation, so merge order cannot drift a cent).
  */
object Incremental {

  type Q = (SparkSession, String) => DataFrame

  /** Maintained per-customer order-revenue summary: the view
    * `orders ⋈ lineitem → groupBy(o_custkey) {sum qty, count}` advanced
    * from (old snapshots + deltas) by delta joins + partial re-fold.
    * Splits are deterministic and independent (orderkey-mod for orders,
    * partkey-mod for lineitem) so both delta joins are non-trivially
    * exercised, including delta×delta pairs. */
  def qIvmJoinDelta: Q = (s, dir) => {
    val t = Tables(s, dir)
    val orders = t.orders.select("o_orderkey", "o_custkey")
    val li = t.lineitem.select("l_orderkey", "l_partkey", "l_quantity")

    val oldO = orders.filter(col("o_orderkey") % 10 =!= 0)
    val dO   = orders.filter(col("o_orderkey") % 10 === 0)
    val oldL = li.filter(col("l_partkey") % 7 =!= 0)
    val dL   = li.filter(col("l_partkey") % 7 === 0)

    def partials(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))

    // The stored view (built once in production, recomputed here so the
    // whole algebra sits in one plan) + the two delta-join contributions.
    val vOld   = partials(oldO, oldL)
    val dFromO = partials(dO, oldL.unionByName(dL)) // ΔO ⋈ L_new
    val dFromL = partials(oldO, dL)                 // O_old ⋈ ΔL
    vOld.unionByName(dFromO).unionByName(dFromL)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("qty")).as("qty"), sum(col("n")).as("n"))
      .orderBy(col("o_custkey"))
  }

  val qIvmJoinDeltaSql: String =
    s"""SELECT o_custkey, ${sqlSum("l_quantity")} AS qty, COUNT(*) AS n
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_custkey
       |ORDER BY o_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_ivm_join_delta" -> qIvmJoinDelta)
  val oracles: Map[String, String] = Map(
    "q_ivm_join_delta" -> qIvmJoinDeltaSql)
}
