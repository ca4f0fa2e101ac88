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

  /** IVM under RETRACTIONS — the delta algebra generalized from
    * append-only to delete/update via SIGNED multiplicities (the
    * DBSP/differential-dataflow z-set view): every delta row carries a
    * weight (insert +1, delete −1; an update is a −1 for the old image
    * plus a +1 for the new), a joined pair's weight is the product of its
    * sides' weights, and aggregates fold weighted partials
    * (`sum(w·x)`, `n = Σw`). The same two-delta-join identity applies —
    *
    *   (O+ΔO) ⋈ (L+ΔL)  =  O⋈L  +  ΔO⋈(L+ΔL)  +  O⋈ΔL
    *
    * — now over z-sets, so a deleted pair arrives with net weight 0
    * (+1 old, −1 via ΔO, −1 via ΔL, +1 via ΔO⋈ΔL) and cancels exactly;
    * groups whose Σw hits 0 are dropped (the group no longer exists).
    * This is the mutation-surviving view maintenance the append-only
    * contract (above) routes around: upsert/delete feeds from
    * [[Mutation.qMergeUpsert]]-style merges emit exactly these ±1 pairs.
    *
    * Scale economics are unchanged — O(Δ) joins + O(summary) re-fold; a
    * retraction costs the same as an insert. Weighted sums stay in the
    * decimal fixed-point representation (±1 in decimal is negation —
    * exact), so retraction merge order cannot drift a cent either.
    *
    * The scenario: delete every 10th order, re-key every (10k+1)th order
    * to a new customer (update = retract old image + insert new), delete
    * every 13th-part lineitem. The oracle recomputes the view from the
    * FINAL table states, so the gate proves signed incremental
    * maintenance lands exactly on the batch answer — including that
    * fully-retracted groups vanish rather than linger as zero rows. */
  def qIvmJoinRetract: Q = (s, dir) => {
    val t = Tables(s, dir)
    val D = graft.functions.Exact.D
    val orders = t.orders.select("o_orderkey", "o_custkey")
    val li = t.lineitem.select("l_orderkey", "l_partkey", "l_quantity")

    val oldO = orders.withColumn("w_o", lit(1))
    val updOld = orders.filter(col("o_orderkey") % 10 === 1)
    val dO = orders.filter(col("o_orderkey") % 10 === 0).withColumn("w_o", lit(-1))
      .unionByName(updOld.withColumn("w_o", lit(-1)))
      .unionByName(updOld.withColumn("o_custkey", col("o_custkey") + 100000)
        .withColumn("w_o", lit(1)))

    val oldL = li.withColumn("w_l", lit(1))
    val dL = li.filter(col("l_partkey") % 13 === 0).withColumn("w_l", lit(-1))
    val newL = oldL.unionByName(dL)

    def partials(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .withColumn("w", col("w_o") * col("w_l"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_quantity").cast(D) * col("w")).as("qty_d"),
             sum(col("w")).cast("long").as("n"))

    val vOld   = partials(oldO, oldL) // the stored view's partials
    val dFromO = partials(dO, newL)   // ΔO ⋈ (L + ΔL)
    val dFromL = partials(oldO, dL)   // O_old ⋈ ΔL
    vOld.unionByName(dFromO).unionByName(dFromL)
      .groupBy(col("o_custkey"))
      .agg(sum(col("qty_d")).cast("double").as("qty"), sum(col("n")).as("n"))
      .filter(col("n") > 0)
      .orderBy(col("o_custkey"))
  }

  val qIvmJoinRetractSql: String =
    s"""WITH o AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % 10 = 1 THEN o_custkey + 100000
       |              ELSE o_custkey END AS o_custkey
       |  FROM orders WHERE o_orderkey % 10 <> 0),
       |l AS (SELECT l_orderkey, l_quantity FROM lineitem WHERE l_partkey % 13 <> 0)
       |SELECT o_custkey, ${sqlSum("l_quantity")} AS qty, COUNT(*) AS n
       |FROM o JOIN l ON o_orderkey = l_orderkey
       |GROUP BY o_custkey
       |ORDER BY o_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_ivm_join_delta"   -> qIvmJoinDelta,
    "q_ivm_join_retract" -> qIvmJoinRetract)
  val oracles: Map[String, String] = Map(
    "q_ivm_join_delta"   -> qIvmJoinDeltaSql,
    "q_ivm_join_retract" -> qIvmJoinRetractSql)
}
