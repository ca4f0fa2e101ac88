package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.{VectorIndex, VectorMaintenance}
import graft.sources.Tables

/** STREAMING vector-index maintenance — [[StreamingIngest]]'s delivery
  * path over [[graft.llm.VectorMaintenance]]'s two-table transaction:
  * embedding vectors arrive as a checkpointed file stream (one epoch
  * per file), each micro-batch runs the frozen-centroid assignment +
  * WAP append under a per-epoch `wap-id`, and a mid-stream kill/restart
  * replays losslessly ([[VectorMaintenance.applyEpoch]]'s idempotence:
  * fully-applied no-op, torn-stage discard, partial-overlap refusal).
  *
  * What makes the VECTOR stream the easy leg of the trilogy: the epoch
  * body is a map-only fold (assign against broadcast frozen centroids)
  * plus two bounded appends — no norms-style refold, because the index
  * stores no global statistic. The stream only decides WHEN epochs
  * happen; exactness after any epoch count is the
  * [[VectorMaintenance]] per-vector-row argument, unchanged.
  *
  * Entry universe: the managed corpus starts at `vec_id % 13 ≠ 6`, the
  * stream delivers class 6 split across two epoch files, so the served
  * universe is ALL vectors under the base-trained centroids — the SAME
  * universe and DuckDB oracle as the batch maintenance entry, making
  * batch/stream equivalence itself oracle-checked.
  *
  * At 100 TB: per-epoch cost = O(batch) assignment + two appends; the
  * freshness/overhead knob is epoch size (`maxFilesPerTrigger`), and
  * the accumulated per-epoch files fold back with the compaction verb
  * (`vec_index_compact`). */
object VectorStream {

  private val AppendClass = 6
  private val Epochs = 2

  def basePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_vec_stream", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Stage the class-6 arrival files once (deterministic content: two
    * range-split parquet files; `_SUCCESS` gates a torn write). */
  private[streaming] def ensureEpochFiles(s: SparkSession, dir: String,
      base: String): String = {
    val ep = s"$base/epochs"
    if (!Files.isRegularFile(Paths.get(ep, "_SUCCESS"))) {
      graft.llm.IndexFence.rmTree(Paths.get(ep))
      Tables(s, dir).embeddings
        .filter(col("vec_id") % 13 === AppendClass)
        .repartitionByRange(Epochs, col("vec_id"))
        .write.mode("overwrite").parquet(ep)
    }
    ep
  }

  /** Drain the arrival backlog through the per-epoch transaction.
    * Returns the number of epochs that APPLIED (0 when caught up). */
  def runIngest(s: SparkSession, dir: String, base: String): Long = {
    val ep = ensureEpochFiles(s, dir, base)
    val applied = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream
      .schema(s.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (VectorMaintenance.applyEpoch(s, base, batch, epochId))
          applied.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    applied.get()
  }

  /** Oracle-gated: nprobe=1 serve from the STREAM-maintained vector
    * index — identical universe and oracle to `vec_index_append`; what
    * this entry adds to the gate is the delivery path (checkpointed
    * stream, two epochs, per-epoch WAP transactions). Re-runs drain an
    * empty backlog and serve — idempotent. */
  def vecIngestStream: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = VectorMaintenance.ensureBaseAt(s, dir, basePath(dir))
    runIngest(s, dir, base)
    VectorIndex.serve(s, VectorMaintenance.vecPath(base), nprobe = 1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_ingest_stream" -> vecIngestStream)

  val oracleSql: Map[String, String] = Map(
    "vec_ingest_stream" -> VectorMaintenance.vecIndexAppendSql)
}
