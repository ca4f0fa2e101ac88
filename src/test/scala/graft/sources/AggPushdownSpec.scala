package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Metadata-answered aggregates (SupportsPushDownAggregates):
  * count(*)/min/max with no WHERE and no GROUP BY resolve from manifest
  * entries + zone maps with ZERO data-file IO. The proof of zero IO is
  * physical: the data files are DELETED from disk and the aggregates
  * still answer. Conservative refusal (deletion vectors, missing stats)
  * is pinned too — the same query silently reverts to a real scan and
  * stays correct. */
class AggPushdownSpec extends SparkTestBase {

  import spark.implicits._

  private def load(path: String) =
    spark.read.format(classOf[ManifestFileSink].getName).option("path", path).load()

  test("count/min/max answer from metadata even with data files gone") {
    val path = Files.createTempDirectory("graft-aggpd").toString
    (0 until 3).foreach { b =>
      spark.range(b * 10, b * 10 + 10)
        .select($"id", concat(lit("name-"), lpad($"id".cast("string"), 3, "0")).as("tag"),
          ($"id" * 1.5).as("score"))
        .coalesce(1)
        .write.format(classOf[ManifestFileSink].getName)
        .option("path", path).mode("append").save()
    }
    // Ground truth BEFORE removing the files.
    val expect = load(path)
      .agg(count(lit(1)), min($"id"), max($"id"), min($"tag"), max($"tag"),
        min($"score"), max($"score")).head()

    // Physically delete every data file: only metadata remains.
    val dataDir = Paths.get(path, "data")
    val walk = Files.list(dataDir)
    try walk.forEach(f => { Files.delete(f); () }) finally walk.close()

    val got = load(path)
      .agg(count(lit(1)), min($"id"), max($"id"), min($"tag"), max($"tag"),
        min($"score"), max($"score")).head()
    assert(got === expect, "aggregates must be served from manifest metadata")

    // And a full scan, honestly, now fails — the files really are gone.
    intercept[Exception](load(path).collect())
  }

  test("plan shows the metadata scan; group-by and filters keep the real scan") {
    val path = Files.createTempDirectory("graft-aggpd2").toString
    spark.range(0, 100).select($"id", ($"id" % 7).as("g"))
      .write.format(classOf[ManifestFileSink].getName)
      .option("path", path).mode("append").save()

    val pushed = load(path).agg(count(lit(1)).as("n"))
    assert(pushed.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "no-filter global aggregate must push to metadata")
    assert(pushed.head().getLong(0) === 100)

    val grouped = load(path).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    assert(grouped.agg(sum($"n")).head().getLong(0) === 100)

    val filtered = load(path).filter($"id" < 50).agg(count(lit(1)).as("n"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    assert(filtered.head().getLong(0) === 50)
  }

  test("GROUP BY identity partition column answers from metadata — zero data files opened") {
    val path = Files.createTempDirectory("graft-aggpd4").toString
    ManifestFileSink.setPartitionColumns(path, Seq("g"))
    spark.range(0, 100).select(($"id" % 5).as("g"), $"id", ($"id" * 2.0).as("v"))
      .write.format(classOf[ManifestFileSink].getName)
      .option("path", path).mode("append").save()
    val expect = load(path).groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"id").as("mn"), max($"v").as("mx"))
      .orderBy($"g").collect().toSeq

    // The proof of zero IO is physical: delete every data file.
    val dataDir = Paths.get(path, "data")
    val walk = Files.list(dataDir)
    try walk.forEach(f => { Files.delete(f); () }) finally walk.close()

    val grouped = load(path).groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"id").as("mn"), max($"v").as("mx"))
    assert(grouped.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "partition-column GROUP BY must push to metadata:\n" +
        grouped.queryExecution.executedPlan.toString)
    assert(grouped.orderBy($"g").collect().toSeq === expect,
      "per-group metadata answers must equal the real aggregation")

    // Grouping by a NON-partition column still refuses (files are gone,
    // so the honest scan fails loudly rather than answering wrong).
    val byOther = load(path).groupBy($"id").agg(count(lit(1)))
    assert(!byOther.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
  }

  test("an unprovable file refuses the grouped shortcut; results stay exact") {
    val path = Files.createTempDirectory("graft-aggpd5").toString
    // Write WITHOUT the layout declared: mixed-value files, no proofs.
    spark.range(0, 30).select(($"id" % 3).as("g"), $"id").coalesce(1)
      .write.format(classOf[ManifestFileSink].getName)
      .option("path", path).mode("append").save()
    ManifestFileSink.setPartitionColumns(path, Seq("g"))
    val grouped = load(path).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "a file that cannot prove its group must keep the real scan")
    assert(grouped.orderBy($"g").collect().map(_.getLong(1)).toSeq === Seq(10L, 10L, 10L))
  }

  test("deletion vectors refuse the shortcut; results stay exact") {
    val path = Files.createTempDirectory("graft-aggpd3").toString
    spark.range(0, 40).select($"id")
      .write.format(classOf[ManifestFileSink].getName)
      .option("path", path).mode("append").save()
    ManifestFileSink.deleteWhere(path,
      org.apache.spark.sql.sources.GreaterThanOrEqual("id", 35L))
    val agg = load(path).agg(count(lit(1)), min($"id"), max($"id"))
    assert(!agg.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "a deleted row may have been the extreme: metadata answer is unsound")
    val r = agg.head()
    assert(r.getLong(0) === 35 && r.getLong(1) === 0 && r.getLong(2) === 34)
  }

  test("bare COUNT(*) survives deletion vectors: live = rows − |dv|, zero data IO") {
    val path = Files.createTempDirectory("graft-aggpd4").toString
    spark.range(0, 40).select($"id")
      .write.format(classOf[ManifestFileSink].getName)
      .option("path", path).mode("append").save()
    ManifestFileSink.deleteWhere(path,
      org.apache.spark.sql.sources.GreaterThanOrEqual("id", 35L))
    val cnt = load(path).agg(count(lit(1)).as("n"))
    assert(cnt.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "positions are distinct by construction, so the live count is exactly " +
        "derivable from metadata even under row-level deletes")
    assert(cnt.head().getLong(0) === 35)
    // Physical proof: delete the data files, the count still answers.
    val walk = Files.list(Paths.get(path, "data"))
    try walk.forEach(f => { Files.delete(f); () }) finally walk.close()
    assert(load(path).agg(count(lit(1))).head().getLong(0) === 35)
  }
}
