package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.broadcast

/** Typed access to the driver-provided TPC-H-ish parquet tables.
  *
  * Scale notes (design target: ~100 TB `lineitem`/`events` on a 1000-executor
  * cluster; local testing at sf0.001–0.1):
  *   - Every reader is a plain parquet scan so Catalyst's V2 pushdown
  *     (predicate + column pruning + partition pruning) applies untouched.
  *   - `region`/`nation` are constant-size (5/25 rows) at any SF, so their
  *     `*Dim` accessors pre-mark them with [[broadcast]]; `supplier`/`part`
  *     grow with SF, so theirs deliberately do NOT — the planner's
  *     size-based conversion (and AQE at runtime) broadcasts them while
  *     they fit and falls back to a shuffled join when they don't.
  *   - Nothing is cached here: at 100 TB caching a fact table is a mistake;
  *     callers cache intermediate results explicitly when reused.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")

  /** The events table's `ts` physical type has shipped two ways across
    * testdata generations: TIMESTAMP(NANOS) (readable only under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, arriving as LongType
    * nanos) and TIMESTAMP(MICROS) without isAdjustedToUTC (arriving as
    * TimestampNTZType). Normalize both to an instant TimestampType so
    * downstream operators (unix_micros, window/session_window) see one
    * type. The session timezone is pinned to UTC by [[graft.Verify]]/
    * [[graft.Bench]], so the NTZ→instant cast preserves the wall-clock
    * value exactly — same instants the nanos path produced.
    * Nanos→micros uses integer `div` (no double round-trip — 1.7e18 ns
    * exceeds the 2^53 exact-double range). */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", raw.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Broadcast-hinted dimensions — CONSTANT-size only. `region` (5 rows)
    * and `nation` (25 rows) never grow with scale factor, so an
    * unconditional hint is always right. */
  def regionDim: DataFrame   = broadcast(region)
  def nationDim: DataFrame   = broadcast(nation)

  /** `supplier`/`part` GROW with scale factor, so they get NO explicit
    * broadcast hint: a forced hint disables the size check, and at 100 TB
    * a multi-TB `part` would blow the 8 GB broadcast hard limit and kill
    * the query outright. Un-hinted, the planner broadcasts them while
    * their file-size stats fit `spark.sql.autoBroadcastJoinThreshold`
    * (they do at every test SF — plan pins stay BroadcastHashJoin) and
    * AQE's runtime size check takes over beyond that, degrading
    * gracefully to a shuffled hash join instead of an OOM. */
  def supplierDim: DataFrame = supplier
  def partDim: DataFrame     = part
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
