package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Snapshot-mutation operators: MERGE-style upsert between immutable
  * snapshots and SCD Type-2 history construction — the data-management
  * layer every warehouse feeding an H2-style destination needs (the
  * reference overwrites whole tables per push; these operators compute
  * the NEXT snapshot to push).
  *
  * Scale notes:
  *   - Upsert is ONE full-outer shuffled join on the merge key. Both
  *     sides are fact-sized at 100 TB, so neither can broadcast — a
  *     sort-merge/shuffled-hash join keyed on the primary key is the
  *     floor, and AQE handles skew splitting. (The union + row_number
  *     alternative shuffles the same bytes but adds a window sort —
  *     strictly worse.) If the update batch were small, Spark still
  *     cannot broadcast a full-outer join; the right small-batch plan is
  *     the same join with the update side pre-shuffled — still one
  *     exchange of the big side.
  *   - SCD2 history is two windows over the same (user_id | ts, event_id)
  *     partitioning — Catalyst reuses the single sort+shuffle for both
  *     `lag` and `lead`, so the whole operator is one exchange of the
  *     events table, partitioned by user (millions of partitions' worth
  *     of parallelism at 100 TB, no global sort).
  */
object Mutation {

  type Q = (SparkSession, String) => DataFrame

  /** MERGE (upsert): apply an update batch to a base snapshot keyed on
    * o_orderkey — matched rows take the update's values, unmatched update
    * rows insert, unmatched base rows carry over. Base/updates are carved
    * deterministically from `orders` so the oracle can rebuild both. */
  def qMergeUpsert: Q = (s, dir) => {
    val orders = Tables(s, dir).orders
    val base = orders.filter(col("o_orderkey") % 3 =!= 0)
    val updates = orders.filter(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey").as("u_orderkey"),
      col("o_custkey").as("u_custkey"),
      lit("U").as("u_orderstatus"),
      (col("o_totalprice") * lit(1.1)).as("u_totalprice"),
      col("o_orderdate").as("u_orderdate"),
      col("o_orderpriority").as("u_orderpriority"))
    base.join(updates, col("o_orderkey") === col("u_orderkey"), "full_outer")
      .select(
        coalesce(col("u_orderkey"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("u_custkey"), col("o_custkey")).as("o_custkey"),
        coalesce(col("u_orderstatus"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("u_totalprice"), col("o_totalprice")).as("o_totalprice"),
        coalesce(col("u_orderdate"), col("o_orderdate")).as("o_orderdate"),
        coalesce(col("u_orderpriority"), col("o_orderpriority")).as("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  val qMergeUpsertSql: String =
    """WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
      |upd AS (SELECT o_orderkey AS u_orderkey, o_custkey AS u_custkey,
      |          'U' AS u_orderstatus,
      |          o_totalprice * CAST(1.1 AS DOUBLE) AS u_totalprice,
      |          o_orderdate AS u_orderdate, o_orderpriority AS u_orderpriority
      |        FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT COALESCE(u_orderkey, o_orderkey) AS o_orderkey,
      |       COALESCE(u_custkey, o_custkey) AS o_custkey,
      |       COALESCE(u_orderstatus, o_orderstatus) AS o_orderstatus,
      |       COALESCE(u_totalprice, o_totalprice) AS o_totalprice,
      |       COALESCE(u_orderdate, o_orderdate) AS o_orderdate,
      |       COALESCE(u_orderpriority, o_orderpriority) AS o_orderpriority
      |FROM base FULL JOIN upd ON o_orderkey = u_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** SCD Type-2 history: per user, one validity row per CHANGE of the
    * tracked attribute (event_type), with [valid_from, valid_to) ranges
    * and an is_current flag. `lag` detects the change points, `lead` over
    * the surviving change rows closes each range. (event_id tie-breaks
    * identical timestamps, and rides along as the version surrogate key.) */
  private def scd2Ranges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  def qScd2History: Q = (s, dir) =>
    scd2Ranges(s, dir).orderBy(col("user_id"), col("valid_from"), col("event_id"))

  /** SCD2 point-in-time lookup: each purchase event probes the history
    * for the version active at its timestamp — equi-join on the entity
    * key with the [valid_from, valid_to) range as join residual. Because
    * the ranges tile each user's timeline gaplessly from their first
    * event, every probe matches exactly one version. At 100 TB this is
    * the standard fact→SCD2 dimension probe: hash-partitioned by the
    * key, per-key range list is small, so the residual scan is bounded;
    * the degenerate hot-entity case upgrades to the as-of merge pattern
    * (q_asof_join). */
  def qScd2Lookup: Q = (s, dir) => {
    val hist = scd2Ranges(s, dir).select(
      col("user_id").as("h_user"), col("event_id").as("version_id"),
      col("event_type").as("active_type"), col("valid_from"), col("valid_to"))
    val probes = Tables(s, dir).events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    probes.join(hist,
        col("user_id") === col("h_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("version_id"), col("active_type"))
      .orderBy(col("event_id"))
  }

  val qScd2LookupSql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |hist AS (
      |  SELECT user_id AS h_user, event_id AS version_id, event_type AS active_type,
      |    ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT e.event_id, e.user_id, e.ts, e.value, h.version_id, h.active_type
      |FROM events e JOIN hist h
      |  ON e.user_id = h.h_user AND e.ts >= h.valid_from
      |     AND (h.valid_to IS NULL OR e.ts < h.valid_to)
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  val qScd2HistorySql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |changes AS (
      |  SELECT user_id, ts, event_id, event_type FROM ordered
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id, event_id, event_type, ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  (LEAD(ts) OVER w IS NULL) AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Snapshot diff (table-level CDC): classify every key as added /
    * removed / changed between two table versions, dropping the unchanged
    * majority — the reconciliation audit run before replacing a published
    * snapshot, and the input a downstream incremental consumer replays.
    *
    * Scale shape: ONE full-outer join on the primary key (the same
    * exchange [[qMergeUpsert]] pays — both sides fact-sized, AQE splits
    * skew) and the unchanged filter drops ~99% of rows BEFORE anything
    * downstream, so the diff's output is O(churn), not O(table). */
  def qTableDiff: Q = (s, dir) => {
    val orders = Tables(s, dir).orders
    val v1 = orders.filter(col("o_orderkey") % 5 =!= 4)
      .select(col("o_orderkey").as("k1"), col("o_totalprice").as("p1"))
    val v2 = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("k2"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * lit(1.05))
          .otherwise(col("o_totalprice")).as("p2"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .withColumn("change_type",
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(col("p1") =!= col("p2"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col("k1"), col("k2")).as("o_orderkey"),
        col("change_type"), col("p1").as("old_price"), col("p2").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  val qTableDiffSql: String =
    """WITH v1 AS (SELECT o_orderkey AS k1, o_totalprice AS p1
      |            FROM orders WHERE o_orderkey % 5 <> 4),
      |v2 AS (SELECT o_orderkey AS k2,
      |         CASE WHEN o_orderkey % 7 = 0
      |              THEN o_totalprice * CAST(1.05 AS DOUBLE)
      |              ELSE o_totalprice END AS p2
      |       FROM orders WHERE o_orderkey % 3 <> 0)
      |SELECT COALESCE(k1, k2) AS o_orderkey,
      |  CASE WHEN k1 IS NULL THEN 'added'
      |       WHEN k2 IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change_type,
      |  p1 AS old_price, p2 AS new_price
      |FROM v1 FULL JOIN v2 ON k1 = k2
      |WHERE k1 IS NULL OR k2 IS NULL OR p1 <> p2
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_merge_upsert" -> qMergeUpsert,
    "q_scd2_history" -> qScd2History,
    "q_scd2_lookup"  -> qScd2Lookup,
    "q_table_diff"   -> qTableDiff,
  )

  val oracles: Map[String, String] = Map(
    "q_merge_upsert" -> qMergeUpsertSql,
    "q_scd2_history" -> qScd2HistorySql,
    "q_scd2_lookup"  -> qScd2LookupSql,
    "q_table_diff"   -> qTableDiffSql,
  )
}
