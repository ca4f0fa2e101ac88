package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.llm.{VectorIndex, VectorMaintenance}
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** The streaming vector-maintenance contract: each micro-batch runs the
  * two-table WAP transaction with frozen-centroid assignment; a
  * mid-stream kill/restart converges to the batch-maintained result
  * (same corpus, hash-identical serve); a caught-up re-run drains
  * nothing. Epoch idempotence itself is pinned in VecMaintenanceSpec —
  * this spec gates the delivery composition. */
class VectorStreamSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-vecstream-dir").toString
    for (t <- Seq("embeddings", "documents"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
    d
  }

  test("mid-stream kill + restart converges to the batch-maintained serve") {
    val dir = freshDir()
    val base = Files.createTempDirectory("graft-vecstream-kill").toString
    VectorMaintenance.ensureBaseAt(spark, dir, base)
    def corpusCount(): Long = spark.read.format(fmt)
      .option("path", VectorMaintenance.corpusTable(base)).load().count()
    val ep = VectorStream.ensureEpochFiles(spark, dir, base)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        VectorMaintenance.applyEpoch(spark, base, b, id)
        if (seen.incrementAndGet() == 1)
          throw new RuntimeException("simulated mid-stream kill")
        ()
      }
      .start()
    intercept[StreamingQueryException](q.awaitTermination())
    val midCount = corpusCount()
    // Restart: the unacknowledged epoch replays as a no-op, the rest drains.
    VectorStream.runIngest(spark, dir, base)
    assert(corpusCount() > midCount, "the remaining epoch must land")
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(corpusCount() === all.count(),
      "the stream-maintained corpus must hold every vector exactly once")
    // Hash-identical to the BATCH maintenance path over the same dir:
    // same base universe → same frozen centroids → same assignments.
    val batchBase = VectorMaintenance.ensureBase(spark, dir)
    VectorMaintenance.ingestAppend(spark, batchBase,
      all.filter(col("vec_id") % 13 === 6))
    assert(VectorIndex.serve(spark, VectorMaintenance.vecPath(base), 1)
      .collect().toSeq ===
      VectorIndex.serve(spark, VectorMaintenance.vecPath(batchBase), 1)
        .collect().toSeq)
    // A fully-caught-up re-run drains nothing and stays fresh.
    assert(VectorStream.runIngest(spark, dir, base) === 0L)
    assert(graft.llm.IndexFence.staleness(VectorMaintenance.vecPath(base))
      .contains(false))
  }
}
