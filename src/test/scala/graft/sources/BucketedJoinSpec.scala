package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed table layout: the pre-shuffle that amortizes the
  * orders⋈lineitem exchange across every query that joins on orderkey.
  * Both tables bucket (and sort) by their join key into the same bucket
  * count, so the sort-merge join runs with NO Exchange on either side —
  * at 100 TB that is the difference between re-shuffling the fact tables
  * per query and reading co-located buckets. */
class BucketedJoinSpec extends SparkTestBase {

  test("co-bucketed tables join without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin"))
      assert(joinLine.isDefined, s"expected sort-merge join in:\n$plan")
      // No Exchange may appear below the join: bucket layout satisfies the
      // join's distribution requirement. The only exchange allowed is the
      // one for the final groupBy on a different key.
      val joinIdx = plan.indexOf("SortMergeJoin")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(o_orderkey")
          && !belowJoin.contains("Exchange hashpartitioning(l_orderkey"),
        s"join inputs re-shuffled despite bucketing:\n$plan")

      // Result parity with the unbucketed join.
      val plain = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        plain.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
