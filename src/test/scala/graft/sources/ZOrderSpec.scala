package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Z-order claim, measured: after `optimizeZOrder(a, b)`, point
  * filters on a AND on b BOTH prune files through the ordinary zone
  * maps, where range clustering on `a` alone leaves `b` unprunable.
  * Content is checksum-exact across the rewrite (it is still
  * [[ManifestFileSink.optimizePinned]]'s snapshot-pinned commit). */
class ZOrderSpec extends SparkTestBase {

  import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

  private def fmt = classOf[ManifestFileSink].getName

  private def filesReadFor(path: String, cond: org.apache.spark.sql.Column): (Long, Long) = {
    val q = spark.read.format(fmt).option("path", path).load().filter(cond)
    q.collect()
    val scan = q.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    (scan.metrics("filesRead").value, scan.metrics("filesPruned").value)
  }

  test("z-order on (a, b) prunes point filters on BOTH dimensions; range on a prunes only a") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // A 64×64 grid in shuffled order: neither dimension is naturally
      // clustered in the written files.
      val path = Files.createTempDirectory("graft-zorder").toString
      val grid = spark.range(4096)
        .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"),
          col("id").as("payload"))
        .repartition(8, (col("payload") * 2654435761L).mod(97)) // scatter
      grid.write.format(fmt).option("path", path).mode("append").save()

      val before = spark.read.format(fmt).option("path", path).load()
        .agg(sum(col("payload")), count(lit(1))).head()

      // Range clustering on `a`: a prunes, b does not.
      assert(ManifestFileSink.optimize(spark, path, "a", numFiles = 16) > 0)
      val (ra, pa) = filesReadFor(path, col("a") === 7L)
      assert(pa > 0 && ra < ra + pa, s"range-clustered a must prune (read=$ra pruned=$pa)")
      val (rb0, pb0) = filesReadFor(path, col("b") === 7L)
      assert(pb0 === 0,
        s"b is scattered across every a-clustered file (pruned=$pb0 expected 0)")

      // Z-order on (a, b): BOTH dimensions prune.
      assert(ManifestFileSink.optimizeZOrder(spark, path, Seq("a", "b"), numFiles = 16) > 0)
      val (ra2, pa2) = filesReadFor(path, col("a") === 7L)
      val (rb2, pb2) = filesReadFor(path, col("b") === 7L)
      assert(pa2 > 0, s"z-order must keep a prunable (read=$ra2 pruned=$pa2)")
      assert(pb2 > 0, s"z-order must make b prunable (read=$rb2 pruned=$pb2)")

      // Content exact across both rewrites.
      val after = spark.read.format(fmt).option("path", path).load()
        .agg(sum(col("payload")), count(lit(1))).head()
      assert(after === before)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("CALL graft.system.zorder drives the same rewrite through SQL") {
    val root = Files.createTempDirectory("graft-zproc").toString
    spark.conf.set("spark.sql.catalog.gzo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzo.root", root)
    spark.sql("CREATE TABLE gzo.db.zt (a BIGINT, b BIGINT, payload BIGINT)")
    spark.sql(
      """INSERT INTO gzo.db.zt
        |SELECT id % 32, CAST(id / 32 AS BIGINT), id FROM range(1024)""".stripMargin)
    val affected = spark.sql(
      "CALL gzo.system.zorder('db.zt', 'a,b', 8)").head().getInt(0)
    assert(affected > 0)
    assert(spark.table("gzo.db.zt").count() === 1024)
  }
}
