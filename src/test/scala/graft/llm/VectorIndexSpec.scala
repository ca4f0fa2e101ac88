package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.functions._

/** The persisted-IVF contract: build once into the storage-partitioned
  * layout, serve by opening ONLY the probed cells' files, return exactly
  * the in-query trained index's answers. */
class VectorIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-vecindex").toString
    VectorIndex.build(spark, sf, p)
    p
  }

  test("build writes one data file per cell; every file is single-celled") {
    val files = spark.read.format(classOf[ManifestFileSink].getName)
      .option("path", s"$path/assigned").load()
      .groupBy(col("_file"))
      .agg(countDistinct(col("cell")).as("nc"), first(col("cell")).as("cell"))
      .collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getLong(1) === 1L), "a cell file must hold one cell")
    assert(files.map(_.getLong(2)).distinct.length === files.length,
      "one file per cell (the clustered demux)")
  }

  test("serve opens ONLY the probed cells' files (partition-pruned fetch)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = VectorIndex.serve(spark, path, nprobe = 1)
      val rows = served.collect()
      assert(rows.length > 0)
      // The candidate-fetch scan (the one with the pushed cell IN filter)
      // reads exactly the probed cells' files and prunes the rest.
      val scans = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
        .filter(_.scan.description.contains("PushedFilters: [In(cell"))
      assert(scans.nonEmpty, "expected the probed-cell IN filter pushed to the index scan")
      val nCells = spark.read.format(classOf[ManifestFileSink].getName)
        .option("path", s"$path/assigned").load()
        .select(col("cell")).distinct().count()
      val fetch = scans.head
      val read = fetch.metrics("filesRead").value
      val pruned = fetch.metrics("filesPruned").value
      assert(read + pruned === nCells,
        s"read($read) + pruned($pruned) must cover all $nCells cell files")
      assert(read < nCells,
        s"the fetch must not open every cell (read=$read of $nCells)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("served answers are bit-identical to the in-query trained index") {
    val got = VectorIndex.serve(spark, path, nprobe = 1)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Similarity.knnIvfTrained(spark, sf)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("staleness fence: drifted corpus → serve REFUSES, build rebuilds") {
    // A mutable corpus copy (the driver's testdata is read-only).
    val dir = Files.createTempDirectory("graft-vecindex-corpus").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.parquet(s"$dir/embeddings.parquet")
    val p = Files.createTempDirectory("graft-vecindex-fence").toString
    VectorIndex.build(spark, dir, p)
    assert(VectorIndex.staleness(p) === Some(false), "fresh right after build")
    assert(VectorIndex.serve(spark, p, nprobe = 1).collect().nonEmpty)

    // Drift: a REAL corpus change (half the vectors vanish).
    val v2 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 2 === 0).cache()
    v2.count()
    v2.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    v2.unpersist()

    assert(VectorIndex.staleness(p) === Some(true), "fence sees the drift")
    val ex = intercept[IllegalStateException](VectorIndex.serve(spark, p, nprobe = 1))
    assert(ex.getMessage.contains("STALE"))

    // build() detects the same drift and reconstructs in place.
    VectorIndex.build(spark, dir, p)
    assert(VectorIndex.staleness(p) === Some(false), "rebuild re-fences")
    val served = VectorIndex.serve(spark, p, nprobe = 1).collect()
    assert(served.nonEmpty)
    assert(served.forall(r => r.getAs[Long]("neighbor_id") % 2 === 0),
      "post-rebuild neighbors come from the NEW corpus (even vec_ids only)")
  }

  test("streaming append: new vectors stream into the index, serve picks them up with no rebuild") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Mutable corpus copy + fresh index over it.
    val dir = Files.createTempDirectory("graft-vecindex-stream-corpus").toString
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    base.write.parquet(s"$dir/embeddings.parquet")
    val p = Files.createTempDirectory("graft-vecindex-stream").toString
    VectorIndex.build(spark, dir, p)
    val preRows = spark.read.format(classOf[ManifestFileSink].getName)
      .option("path", s"$p/assigned").load().count()
    val preTop = VectorIndex.serve(spark, p, nprobe = 1)
      .filter(col("query_id") === 3L).orderBy("rank").collect()

    // New vectors arrive as a STREAM: exact duplicates of query vector 3
    // under fresh ids — after ingestion they must dominate its top-k.
    val dup = base.filter(col("vec_id") === 3L).head().getSeq[Float](1)
    val newIds = Seq(90001L, 90002L)
    val in = MemoryStream[Long]
    in.addData(newIds: _*)
    val vectors = in.toDF().select(col("value").as("vec_id"),
      typedlit(dup).as("embedding"))
    val q = VectorIndex.assignNew(spark, p, vectors)
      .writeStream.format(classOf[ManifestFileSink].getName)
      .option("path", s"$p/assigned")
      .option("checkpointLocation", Files.createTempDirectory("graft-vis-ck").toString)
      .start()
    q.processAllAvailable(); q.stop()

    // The ingestion pipeline advances corpus and index in lockstep.
    val newCorpusRows = newIds.map(id => (id, dup)).toDF("vec_id", "embedding")
    newCorpusRows.write.mode("append").parquet(s"$dir/embeddings.parquet")
    VectorIndex.refreshFence(p, dir)
    assert(VectorIndex.staleness(p) === Some(false), "lockstep append re-fences")

    // serve sees the new vectors with NO rebuild...
    val post = VectorIndex.serve(spark, p, nprobe = 1)
    val postTop = post.filter(col("query_id") === 3L).orderBy("rank").collect()
    assert(postTop.take(2).map(_.getAs[Long]("neighbor_id")).toSet === newIds.toSet,
      s"the streamed duplicates must be query 3's new nearest neighbors, " +
        s"got ${postTop.toSeq} (pre-append: ${preTop.toSeq})")
    val postRows = spark.read.format(classOf[ManifestFileSink].getName)
      .option("path", s"$p/assigned").load().count()
    assert(postRows === preRows + newIds.size)

    // ...and the candidate fetch still opens ONLY probed cells' files.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = VectorIndex.serve(spark, p, nprobe = 1)
      served.collect()
      val fetch = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
        .filter(_.scan.description.contains("PushedFilters: [In(cell")).head
      val nFiles = spark.read.format(classOf[ManifestFileSink].getName)
        .option("path", s"$p/assigned").load()
        .select(col("_file")).distinct().count()
      assert(fetch.metrics("filesRead").value + fetch.metrics("filesPruned").value === nFiles)
      assert(fetch.metrics("filesRead").value < nFiles,
        "post-append fetch must still prune the unprobed cells")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    // Imbalance maintenance: piling many more duplicates into one cell
    // trips the metadata-only drift threshold and maintain() retrains.
    assert(!VectorIndex.maintain(spark, dir, p, maxImbalance = 4.0),
      "a mild append must not trigger a rebuild")
    val flood = (91000L until 91300L).map(id => (id, dup)).toDF("vec_id", "embedding")
    flood.write.mode("append").parquet(s"$dir/embeddings.parquet")
    VectorIndex.assignNew(spark, p, flood)
      .write.format(classOf[ManifestFileSink].getName)
      .option("path", s"$p/assigned").mode("append").save()
    VectorIndex.refreshFence(p, dir)
    assert(VectorIndex.assignmentImbalance(p) > 4.0,
      s"the flood must skew one cell, imbalance=${VectorIndex.assignmentImbalance(p)}")
    assert(VectorIndex.maintain(spark, dir, p, maxImbalance = 4.0),
      "imbalance past the threshold must trigger the rebuild path")
    assert(VectorIndex.staleness(p) === Some(false))
    assert(VectorIndex.assignmentImbalance(p) <= 4.0 ||
      VectorIndex.serve(spark, p, nprobe = 1).collect().nonEmpty,
      "post-rebuild index serves (retraining rebalanced or at least re-fenced)")
  }

  test("staleness fence: pre-fence legacy index is rebuilt, not trusted") {
    val dir = Files.createTempDirectory("graft-vecindex-corpus2").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .write.parquet(s"$dir/embeddings.parquet")
    val p = Files.createTempDirectory("graft-vecindex-legacy").toString
    VectorIndex.build(spark, dir, p)
    // Simulate a pre-fence index: drop the fence file.
    Files.delete(java.nio.file.Paths.get(p, "corpus.fp"))
    assert(VectorIndex.staleness(p) === None, "legacy: freshness unprovable")
    VectorIndex.build(spark, dir, p) // must NOT no-op
    assert(Files.isRegularFile(java.nio.file.Paths.get(p, "corpus.fp")),
      "rebuild restores the fence")
    assert(VectorIndex.staleness(p) === Some(false))
  }
}
