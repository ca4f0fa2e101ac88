package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.plans.MaterializedRollupRewrite

/** Incremental rollup maintenance: per-batch partial folding, replay
  * idempotency, and the full circle — a stream-maintained summary serving
  * the MaterializedRollupRewrite. */
class RollupMaintenanceSpec extends SparkTestBase {

  private def freshDir(): String =
    Files.createTempDirectory("graft-rollup-maint").toString

  test("micro-batches fold into the summary; equals the full recomputation") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshDir()
    val in = MemoryStream[(String, Double)]
    val q = RollupMaintenance.sink(in.toDF().toDF("k", "v"), Seq("k"), Seq("v"), root,
        minCols = Seq("v"), maxCols = Seq("v"))
      .option("checkpointLocation", freshDir()).start()
    try {
      in.addData(("a", 1.0), ("b", 2.0), ("a", 3.0)); q.processAllAvailable()
      in.addData(("b", 4.0), ("c", 5.0)); q.processAllAvailable()
    } finally q.stop()

    val dir = RollupMaintenance.currentDir(root).get
    val got = spark.read.parquet(dir)
      .select(col("k"), col("g_sum_v"), col("g_cnt"), col("g_min_v"), col("g_max_v"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got === Array(
      ("a", 4.0, 2L, 1.0, 3.0), ("b", 6.0, 2L, 2.0, 4.0), ("c", 5.0, 1L, 5.0, 5.0)),
      s"summary diverged from the direct aggregate: ${got.mkString(",")}")
    // Exactly one live version dir (predecessors GC'd) + the state file.
    val versions = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("v"))
    assert(versions.length === 1, s"superseded versions left behind: ${versions.mkString(",")}")
  }

  test("replayed batchId is a no-op: summary unchanged, applyBatch reports it") {
    import spark.implicits._
    val root = freshDir()
    val b0 = Seq(("x", 10.0), ("y", 20.0)).toDF("k", "v")
    assert(RollupMaintenance.applyBatch(b0, 0L, Seq("k"), Seq("v"), root))
    val before = spark.read.parquet(RollupMaintenance.currentDir(root).get)
      .collect().map(_.toString).sorted
    // Engine restart: batch 0 re-delivered (possibly with identical data).
    assert(!RollupMaintenance.applyBatch(b0, 0L, Seq("k"), Seq("v"), root),
      "replayed batch must not fold in twice")
    val after = spark.read.parquet(RollupMaintenance.currentDir(root).get)
      .collect().map(_.toString).sorted
    assert(after === before, "replay double-counted the batch")
  }

  test("manifest change feed drives batch-mode incremental maintenance exactly-once") {
    import spark.implicits._
    // The composition: commits land in a manifest table, the maintenance
    // job wakes up on a cadence, reads ONLY the commits after its resume
    // point (`sinceManifest` change feed), folds them as a batch keyed by
    // an increasing id, and advances the resume point — incremental view
    // maintenance over a table feed instead of a stream, with the same
    // replay idempotency.
    val fmt = classOf[graft.sources.ManifestFileSink].getName
    val tableDir = freshDir()
    val root = freshDir()
    def append(rows: (String, Double)*): String = {
      rows.toDF("k", "v").coalesce(1)
        .write.format(fmt).option("path", tableDir).mode("append").save()
      graft.sources.ManifestFileSink.latestManifest(tableDir).get
    }
    def maintain(since: Option[String], upTo: String, batchId: Long): Unit = {
      val reader = spark.read.format(fmt).option("path", tableDir)
        .option("asOfManifest", upTo)
      val delta = since.fold(reader)(m => reader.option("sinceManifest", m)).load()
      assert(RollupMaintenance.applyBatch(delta, batchId, Seq("k"), Seq("v"), root))
    }
    val m1 = append(("a", 1.0), ("b", 2.0))
    maintain(None, m1, 1L)
    val m2 = append(("a", 3.0), ("c", 4.0))
    append(("b", 5.0)) // lands AFTER the cycle's asOf pin — next cycle's work
    maintain(Some(m1), m2, 2L)
    val got = spark.read.parquet(RollupMaintenance.currentDir(root).get)
      .select(col("k"), col("g_sum_v"), col("g_cnt")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(got === Array(("a", 4.0, 2L), ("b", 2.0, 1L), ("c", 4.0, 1L)),
      s"change-feed maintenance diverged: ${got.mkString(",")}")
    // The late commit folds in the next cycle; a replayed cycle is a no-op.
    val m3 = graft.sources.ManifestFileSink.latestManifest(tableDir).get
    maintain(Some(m2), m3, 3L)
    assert(!RollupMaintenance.applyBatch(
      spark.read.format(fmt).option("path", tableDir)
        .option("sinceManifest", m2).option("asOfManifest", m3).load(),
      3L, Seq("k"), Seq("v"), root), "replayed maintenance cycle must no-op")
    val fin = spark.read.parquet(RollupMaintenance.currentDir(root).get)
      .select(col("k"), col("g_sum_v"), col("g_cnt")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(fin === Array(("a", 4.0, 2L), ("b", 7.0, 2L), ("c", 4.0, 1L)))
  }

  test("maintained HLL sketch partials: estimate equals the full-history distinct") {
    import spark.implicits._
    val root = freshDir()
    // Distinct users per key across batches WITH overlap — the case plain
    // counters cannot maintain (u2 arrives in both batches for k=a).
    assert(RollupMaintenance.applyBatch(
      Seq(("a", "u1"), ("a", "u2"), ("b", "u1")).toDF("k", "u"),
      0L, Seq("k"), sumCols = Nil, root, distinctCols = Seq("u")))
    assert(RollupMaintenance.applyBatch(
      Seq(("a", "u2"), ("a", "u3"), ("b", "u9")).toDF("k", "u"),
      1L, Seq("k"), sumCols = Nil, root, distinctCols = Seq("u")))
    val got = spark.read.parquet(RollupMaintenance.currentDir(root).get)
      .select(col("k"), hll_sketch_estimate(col("g_hll_u")).as("nd"), col("g_cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Array(("a", 3L, 4L), ("b", 2L, 2L)),
      s"sketch union diverged from full-history distinct: ${got.mkString(",")}")
  }

  test("manifest commit feed as a STREAMING source: view advances, restart resumes from the checkpointed seq, replay no-ops") {
    import spark.implicits._
    // The continuous version of the batch-cycle test above: the manifest
    // table IS the stream (offsets = commit seqs), the checkpoint replaces
    // the hand-carried sinceManifest resume point, and RollupMaintenance's
    // batchId fence makes a re-delivered micro-batch a no-op.
    val fmt = classOf[graft.sources.ManifestFileSink].getName
    val tableDir = freshDir()
    val root = freshDir()
    val ckpt = freshDir()
    def append(rows: (String, Double)*): Unit =
      rows.toDF("k", "v").coalesce(1)
        .write.format(fmt).option("path", tableDir).mode("append").save()
    def drain(): Unit = {
      val q = RollupMaintenance.sink(
          spark.readStream.format(fmt).option("path", tableDir).load(),
          Seq("k"), Seq("v"), root)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
    }
    def summary(): Array[(String, Double, Long)] =
      spark.read.parquet(RollupMaintenance.currentDir(root).get)
        .select(col("k"), col("g_sum_v"), col("g_cnt")).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)

    append(("a", 1.0), ("b", 2.0))
    append(("a", 3.0))
    drain()
    assert(summary() === Array(("a", 4.0, 2L), ("b", 2.0, 1L)),
      s"first drain diverged: ${summary().mkString(",")}")

    // Commits land while no stream is running; the restarted stream must
    // resume from the checkpointed seq — folding ONLY the new commits
    // (the old ones double-counted would show as a:8/b:4).
    append(("c", 5.0), ("b", 1.0))
    drain()
    assert(summary() === Array(("a", 4.0, 2L), ("b", 3.0, 2L), ("c", 5.0, 1L)),
      s"restart did not resume from the recorded offset: ${summary().mkString(",")}")

    // Nothing new: the drain admits no batch and the summary version is
    // untouched (replay no-op end-to-end).
    val before = RollupMaintenance.state(root).get
    drain()
    assert(RollupMaintenance.state(root).get === before,
      "empty drain must not advance the summary")
  }

  test("stream-maintained summary serves the MV rewrite on the base table") {
    import spark.implicits._
    val root = freshDir()
    val baseDir = s"${freshDir()}/base.parquet"
    val rows = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("c", 4.0))
    rows.toDF("k", "v").write.parquet(baseDir)
    // Maintenance path sees the same rows as two batches.
    assert(RollupMaintenance.applyBatch(
      rows.take(2).toDF("k", "v"), 0L, Seq("k"), Seq("v"), root))
    assert(RollupMaintenance.applyBatch(
      rows.drop(2).toDF("k", "v"), 1L, Seq("k"), Seq("v"), root))

    val summaryDir = RollupMaintenance.currentDir(root).get
    MaterializedRollupRewrite.register(MaterializedRollupRewrite.RollupDef(
      basePath = baseDir, rollupPath = summaryDir, keys = Seq("k"),
      sums = Map("v" -> "g_sum_v"), countCol = Some("g_cnt"),
      mins = Map.empty, maxs = Map.empty, cnts = Map("v" -> "g_cntn_v")))
    try {
      val q = spark.read.parquet(baseDir).groupBy(col("k"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .orderBy(col("k"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(root) && !plan.contains(baseDir),
        s"query not answered from the maintained summary:\n$plan")
      assert(q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        === Array(("a", 4.0, 2L), ("b", 2.0, 1L), ("c", 4.0, 1L)))

      // A further batch supersedes (and GC's) the registered version dir;
      // the registration must be repointed, not left chasing deleted files.
      val more = Seq(("c", 6.0))
      (more.toDF("k", "v").write.mode("append").parquet(baseDir))
      assert(RollupMaintenance.applyBatch(
        more.toDF("k", "v"), 2L, Seq("k"), Seq("v"), root))
      val q2 = spark.read.parquet(baseDir).groupBy(col("k"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .orderBy(col("k"))
      val plan2 = q2.queryExecution.executedPlan.toString
      assert(plan2.contains("v2") && !plan2.contains(baseDir),
        s"registration was not repointed to the new summary version:\n$plan2")
      assert(q2.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        === Array(("a", 4.0, 2L), ("b", 2.0, 1L), ("c", 10.0, 2L)))
    } finally MaterializedRollupRewrite.deregister(baseDir)
  }

  test("weighted maintenance: the manifest feed's z-set deltas keep the rollup exact under deletes") {
    import spark.implicits._
    val fmt = classOf[graft.sources.ManifestFileSink].getName
    val base = freshDir()
    val root = freshDir()
    val ck = freshDir()

    def drain(): Unit = {
      val q = RollupMaintenance.weightedSink(
        spark.readStream.format(fmt).option("path", base)
          .option("changeFeedWeights", "true").load(),
        Seq("name"), Seq("score"), root)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def summary(): Map[String, (Double, Long)] =
      spark.read.parquet(RollupMaintenance.currentDir(root).get)
        .select(col("name"), col("g_sum_score"), col("g_cnt"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def recompute(): Map[String, (Double, Long)] =
      spark.read.format(fmt).option("path", base).load()
        .groupBy("name").agg(sum("score").as("s"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0))
      .toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", base).mode("append").save()
    drain()
    assert(summary() === recompute())

    // Retraction: the delete subtracts exactly what its insert added.
    graft.sources.ManifestFileSink.deleteWhere(base,
      org.apache.spark.sql.sources.EqualTo("id", 2L))
    drain()
    assert(summary() === recompute())
    assert(summary()("x") === ((10.0, 1L)))

    // A group retracted to zero VANISHES from the summary.
    graft.sources.ManifestFileSink.deleteWhere(base,
      org.apache.spark.sql.sources.EqualTo("id", 3L))
    Seq((4L, "z", 40.0)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", base).mode("append").save()
    drain()
    assert(summary() === recompute())
    assert(!summary().contains("y"), "zero-count group must vanish")

    // Replay: a re-run with the same checkpoint admits nothing, state stable.
    drain()
    assert(summary() === recompute())
  }

  test("pushTouchedToH2 refuses a batch above maxTouchedGroups — the collect is capped") {
    import spark.implicits._
    val root = freshDir()
    // Seed a maintained summary so the push path has a state dir to join.
    val b0 = Seq(("a", 1.0, 1), ("b", 2.0, 1), ("c", 3.0, 1))
      .toDF("k", "v", "_change_weight")
    assert(RollupMaintenance.applyWeightedBatch(b0, 0L, Seq("k"), Seq("v"), root))
    val cfg = graft.sinks.H2Config("h2:mem:cap",
      driverClass = classOf[graft.sinks.RecordingDriver].getName)
    // 3 touched groups > cap of 2: the push must REFUSE, never collect.
    val e = intercept[IllegalStateException] {
      RollupMaintenance.pushTouchedToH2(b0, 0L, Seq("k"), Seq("v"), root,
        "rollup_cap", cfg, maxTouchedGroups = 2)
    }
    assert(e.getMessage.contains("touches more than 2 groups") &&
      e.getMessage.contains("mergeUpsert"),
      s"refusal must carry the bound and the distributed alternative: ${e.getMessage}")
    // Under the cap the same batch pushes fine.
    graft.sinks.RecordingDb.reset()
    RollupMaintenance.pushTouchedToH2(b0, 0L, Seq("k"), Seq("v"), root,
      "rollup_cap", cfg, maxTouchedGroups = 3)
    assert(graft.sinks.RecordingDb.statements
      .exists(s => s.contains("MERGE INTO \"rollup_cap\"")))
  }
}
