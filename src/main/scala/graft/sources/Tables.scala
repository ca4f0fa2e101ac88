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
  *   - `region`/`nation` are constant-size (5/25 rows) at any SF and
  *     `supplier`/`part` grow far slower than `lineitem`; the `*Dim` accessors
  *     pre-mark them with [[broadcast]] so joins against facts never shuffle
  *     the fact side on a dimension key.
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
  def events: DataFrame    = table("events")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Broadcast-hinted dimensions: always tiny relative to facts. */
  def regionDim: DataFrame   = broadcast(region)
  def nationDim: DataFrame   = broadcast(nation)
  def supplierDim: DataFrame = broadcast(supplier)
  def partDim: DataFrame     = broadcast(part)
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
