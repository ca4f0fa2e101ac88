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

  // ------------------------------------------- gated (SemDeDup) ingest

  def curationBasePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_vec_curation", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Stage the class-6 arrivals as TWO epoch files split by
    * `(vec_id div 13) % 2` with FORCED ascending mtimes — the gated
    * chain is order-dependent (epoch 1 gates against epoch 0's admits),
    * so delivery order must match the oracle's unroll; the `.ready`
    * marker gates a torn write (dot-files are invisible to the file
    * source). */
  private[graft] def ensureGatedEpochFiles(s: SparkSession, dir: String,
      base: String): String = {
    val ep = s"$base/epochs"
    val ready = java.nio.file.Paths.get(ep, ".ready")
    if (!Files.isRegularFile(ready)) {
      graft.llm.IndexFence.rmTree(java.nio.file.Paths.get(ep))
      Files.createDirectories(java.nio.file.Paths.get(ep))
      val now = System.currentTimeMillis()
      for (k <- 0 to 1) {
        val tmp = Files.createTempDirectory("graft-vec-curation-epoch").toString
        Tables(s, dir).embeddings
          .filter(col("vec_id") % 13 === AppendClass &&
            expr(s"(vec_id div 13) % 2 = $k"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = java.nio.file.Paths.get(ep, f"e$k%03d.parquet")
        Files.move(part.toPath, dest)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(now - (2 - k) * 2000L))
        graft.llm.IndexFence.rmTree(java.nio.file.Paths.get(tmp))
      }
      Files.write(ready, Array.emptyByteArray)
    }
    ep
  }

  /** Drain the gated backlog; returns epochs DECIDED in this run. */
  def runGatedIngest(s: SparkSession, dir: String, base: String): Long = {
    val ep = ensureGatedEpochFiles(s, dir, base)
    val decided = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream
      .schema(s.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (VectorMaintenance.curateVecEpoch(s, base, batch, epochId))
          decided.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    decided.get()
  }

  /** Oracle-gated: the admitted class-6 membership (vec_id + assigned
    * cell) after both gated epochs — SemDeDup AT INGEST through the
    * checkpointed stream. The DuckDB oracle unrolls the two sequential
    * admission rounds over frozen base-trained centroids: reject on
    * same-cell cosine ≥ 0.45 vs base ∪ earlier admits, within-epoch
    * keep-first by vec_id. */
  def vecCurationStream: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = VectorMaintenance.ensureBaseAt(s, dir, curationBasePath(dir))
    runGatedIngest(s, dir, base)
    s.read.format(classOf[graft.sources.ManifestFileSink].getName)
      .option("path", s"${VectorMaintenance.vecPath(base)}/assigned").load()
      .filter(col("vec_id") % 13 === AppendClass)
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_ingest_stream" -> vecIngestStream,
    "vec_curation_stream" -> vecCurationStream)

  val oracleSql: Map[String, String] = Map(
    "vec_ingest_stream" -> VectorMaintenance.vecIndexAppendSql,
    "vec_curation_stream" -> VectorMaintenance.vecCurationStreamSql)
}
