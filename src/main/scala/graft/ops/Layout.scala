package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * write-time file organization.
  *
  * Min/max row-group skipping only prunes on the column the data is
  * sorted by; a 100 TB fact table queried by BOTH `partkey` and
  * `suppkey` can't be sorted by both. Interleaving the bits of the two
  * keys into one Morton value and range-partitioning + sorting on it
  * tiles the (x, y) plane into compact squares: every output file covers
  * a ~√F fraction of EACH dimension's range (F = file count), so footer
  * min/max stats prune scans on either predicate — the same layout trick
  * Delta/Iceberg `OPTIMIZE ZORDER BY` applies, built here from plain
  * Spark primitives.
  *
  * The z-value is a pure bit-arithmetic `Column` tree (shift/and/or) —
  * whole-stage-codegen'd, no UDF — and is mirrored in SQL for the DuckDB
  * oracle, so tiling arithmetic is oracle-gated like every other
  * operator. Scale shape: `repartitionByRange(zvalue)` is one range
  * shuffle (sampled bounds, balanced output files) + an in-partition
  * sort; no global sort, no driver materialization.
  */
object Layout {

  type Q = (SparkSession, String) => DataFrame

  /** Interleave the low `bits` bits of two non-negative long columns:
    * x occupies even result bits, y odd. Exact for values < 2^bits. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as ANSI SQL over BIGINT operands (DuckDB). */
  def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString("(", " | ", ")")

  /** Write `df` tiled on the Morton value of two key columns: one range
    * shuffle into `nFiles` balanced partitions, sorted within each so
    * row groups inside a file are compact too.
    *
    * Both dimensions are min/max-normalized to the full `bits` range
    * first — interleaving RAW values lets the wider-ranged column
    * monopolize the high z-bits and the narrow column never clusters
    * (Delta/Iceberg rank-normalize for the same reason). The stats pass
    * is one tiny agg; at 100 TB you'd compute the bounds from a sample
    * or table statistics instead — the write path is unchanged. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  nFiles: Int, path: String): Unit = {
    val r = df.agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
    val (loX, hiX, loY, hiY) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val top = (1L << bits) - 1
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L) else (c - lit(lo)) * lit(top) / lit(hi - lo)
    val z = zvalue(norm(col(xCol), loX, hiX).cast("long"),
                   norm(col(yCol), loY, hiY).cast("long"), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Oracle-gated tiling arithmetic: Morton values over
    * (l_partkey, l_suppkey · 16), aggregated per z-tile. The ×16 aligns
    * the two keys' bit scales with a FIXED constant so the arithmetic
    * stays SF-independent and exactly recomputable by the oracle:
    * TPC-H's partkey:suppkey cardinality ratio is 20 at every SF, so
    * shifting suppkey by 4 bits puts both dimensions within half a bit
    * of each other (the write path normalizes from real stats instead —
    * [[zorderWrite]]). Compact per-tile min/max spans in BOTH
    * dimensions are exactly the property that makes the layout
    * prunable; a bit-order bug breaks the hash match. */
  def zorderTiles: Q = (s, dir) => {
    val z = zvalue(col("l_partkey"), col("l_suppkey") * 16, 16)
    Tables(s, dir).lineitem
      .select(col("l_partkey"), col("l_suppkey"), z.as("zval"))
      .groupBy(shiftright(col("zval"), 12).as("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      .orderBy("tile")
  }

  val zorderTilesSql: String = {
    val z = zvalueSql("l_partkey", "(l_suppkey * 16)", 16)
    s"""SELECT ($z >> 12) AS tile, COUNT(*) AS n_rows,
       |  MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
       |  MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
       |FROM lineitem GROUP BY tile ORDER BY tile""".stripMargin
  }

  val queries: Map[String, Q] = Map("q_zorder_tiles" -> zorderTiles)
  val oracles: Map[String, String] = Map("q_zorder_tiles" -> zorderTilesSql)
}
