package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 custom scan metrics: the Spark UI numbers that let an operator
  * VERIFY the sink's economics per query — zone-map pruning working
  * (`filesPruned`), merge-on-read debt (`dvRowsSkipped`), real IO
  * (`filesRead`). Asserted through BatchScanExec's SQLMetrics after
  * execution, i.e. exactly the values the UI renders. */
class ScanMetricsSpec extends SparkTestBase {

  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

  test("filesRead / filesPruned / dvRowsSkipped surface as SQL metrics") {
    val path = Files.createTempDirectory("graft-metrics").toString
    // 4 single-range files: appends land one file each (coalesce(1)).
    (0 until 4).foreach { b =>
      spark.range(b * 10, b * 10 + 10).select($"id", lit(s"b$b").as("tag"))
        .coalesce(1)
        .write.format(classOf[ManifestFileSink].getName)
        .option("path", path).mode("append").save()
    }
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def load() = spark.read.format(classOf[ManifestFileSink].getName)
        .option("path", path).load()

      // Selective point filter: zone maps admit exactly one file.
      val sel = load().filter($"id" === 15L)
      assert(sel.collect().length === 1)
      val m1 = scanOf(sel).metrics
      assert(m1("filesRead").value === 1, s"expected 1 file read, got ${m1("filesRead").value}")
      assert(m1("filesPruned").value === 3, s"expected 3 files pruned, got ${m1("filesPruned").value}")
      assert(m1("splitsPlanned").value === 1)
      assert(m1("dvRowsSkipped").value === 0)

      // Merge-on-read: deleted rows show up as skipped-row debt.
      ManifestFileSink.deleteWhere(path,
        org.apache.spark.sql.sources.In("id", Array(11L, 12L, 33L)))
      val full = load()
      assert(full.collect().length === 37)
      val m2 = scanOf(full).metrics
      assert(m2("filesRead").value === 4)
      assert(m2("dvRowsSkipped").value === 3,
        s"3 deletion-vector rows must be reported, got ${m2("dvRowsSkipped").value}")
      assert(m2("filesPruned").value === 0)

      // Pushed LIMIT: 10 rows need only the first file's 10 live rows...
      val lim = load().limit(10)
      assert(lim.collect().length === 10)
      assert(scanOf(lim).metrics("filesRead").value === 1,
        "LIMIT 10 over 10-row files must open exactly one file")
      // ...and 25 rows need three files (10 + 7-after-deletes + 10 >= 25).
      val lim2 = load().limit(25)
      assert(lim2.collect().length === 25)
      assert(scanOf(lim2).metrics("filesRead").value === 3)
      // A filter keeps the full scan: residual row-filtering makes a
      // file-prefix cut unsound, and Spark never pushes that limit.
      val flim = load().filter($"id" >= 5L).limit(30)
      assert(flim.collect().length === 30)
      assert(scanOf(flim).metrics("filesRead").value === 4)

      // Pushed TOP-N: ORDER BY id LIMIT 5 on the range-disjoint layout
      // proves via zone maps that only the lowest file can matter...
      val top = load().orderBy($"id").limit(5)
      assert(top.collect().map(_.getLong(0)).toSeq === (0L until 5L))
      assert(scanOf(top).metrics("filesRead").value === 1,
        "ascending top-5 must open only the lowest-range file")
      // ...descending reads only the highest file (33 is deleted, stays out)...
      val bot = load().orderBy($"id".desc).limit(5)
      assert(bot.collect().map(_.getLong(0)).toSeq === Seq(39L, 38L, 37L, 36L, 35L))
      assert(scanOf(bot).metrics("filesRead").value === 1)
      // ...and top-15 needs two files (10 live + 8 live after deletes).
      val top15 = load().orderBy($"id").limit(15)
      assert(top15.collect().map(_.getLong(0)).toSeq ===
        ((0L until 10L) ++ Seq(10L, 13L, 14L, 15L, 16L)))
      assert(scanOf(top15).metrics("filesRead").value === 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
