package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level distributed prefix sums — the scale-safe replacement for an
  * unpartitioned cumulative `Window.orderBy`, which funnels the WHOLE
  * relation through one task's sort (a single-executor memory cliff at
  * 10⁹ rows no matter how correct the answer is).
  *
  * Level 1: `repartitionByRange` on the cumulative order splits the
  * relation into range buckets and each bucket computes its LOCAL running
  * sums / row numbers under a window partitioned by bucket id — every
  * task sorts only its own slice, so parallelism scales with the bucket
  * count, not 1. Level 2: per-bucket totals (ONE row per bucket — bounded
  * by configuration, never by data) are folded into exclusive prefix
  * offsets via a tiny triangular self-join (no window at all: the
  * preceding-bucket aggregate is a `b.__bkt < a.__bkt` join over ≤B²
  * rows, B = bucket count) and BROADCAST back; the global cumulative is
  * local + offset, added map-side.
  *
  * Exactness: range partitioning is key-total (equal order keys land in
  * one bucket) and buckets are ordered by the same keys the local windows
  * sort by, so with a tie-broken total order the composition IS the
  * global cumulative — the sampled bucket boundaries affect scheduling,
  * never values. Sources must be integral so the re-association of the
  * sum is exact.
  */
object DistributedCumulate {

  /** Appends to `df`, under the total order `order` (must include a
    * unique tiebreaker): a 1-based global rank column `rankOut` and one
    * global inclusive running-sum column per `(sourceCol, outCol)` in
    * `sums`. Source columns must be integral (long) for exact
    * re-association. `buckets` is the range-partition fan-out — pass the
    * session's shuffle parallelism.
    */
  def runningTotals(df: DataFrame, buckets: Int, order: Seq[Column],
      sums: Seq[(String, String)], rankOut: String): DataFrame = {
    val ranged = df.repartitionByRange(buckets, order: _*)
      .withColumn("__bkt", spark_partition_id())
    val w = Window.partitionBy(col("__bkt")).orderBy(order: _*)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(
      ranged.withColumn(rankOut, row_number().over(w).cast("long"))) {
      case (d, (src, out)) => d.withColumn(out, sum(col(src)).over(frame))
    }

    // Per-bucket totals: one row per bucket. Exclusive prefix offsets via
    // the triangular join — deliberately not a window, so the whole plan
    // carries zero unpartitioned Window nodes (PlanShapeSpec asserts this
    // suite-wide).
    val totAggs = count(lit(1)).as("__n") +:
      sums.map { case (src, out) => sum(col(src)).as(s"__t_$out") }
    val totals = ranged.groupBy(col("__bkt")).agg(totAggs.head, totAggs.tail: _*)
    val offAggs = coalesce(sum(col("b.__n")), lit(0L)).as(s"__o_$rankOut") +:
      sums.map { case (_, out) =>
        coalesce(sum(col(s"b.__t_$out")), lit(0L)).as(s"__o_$out")
      }
    val offs = totals.as("a")
      .join(totals.as("b"), col("b.__bkt") < col("a.__bkt"), "left_outer")
      .groupBy(col("a.__bkt").as("__bkt"))
      .agg(offAggs.head, offAggs.tail: _*)

    val joined = local.join(broadcast(offs), "__bkt")
    val shifted = sums.foldLeft(
      joined.withColumn(rankOut, col(rankOut) + col(s"__o_$rankOut"))) {
      case (d, (_, out)) => d.withColumn(out, col(out) + col(s"__o_$out"))
    }
    shifted.drop("__bkt" +: (rankOut +: sums.map(_._2)).map(c => s"__o_$c"): _*)
  }
}
