package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.{IndexMaintenance, TextIndex}
import graft.sources.Tables

/** STREAMING index maintenance — the production arrival path for
  * [[graft.llm.IndexMaintenance]] (verdict-r14 #4, carried to r15 Next
  * #4): documents arrive as a stream, each micro-batch runs the SAME
  * five-table WAP ingest transaction the batch entry uses, and a
  * mid-stream kill/restart replays losslessly.
  *
  * The composition is deliberately thin — every hard guarantee lives
  * one layer down, where it is already specced:
  *
  *   - `readStream` over a file source (one epoch per file via
  *     `maxFilesPerTrigger`), `Trigger.AvailableNow` so the entry
  *     drains the backlog and stops — the same query restarted later
  *     picks up exactly the unprocessed files from its checkpoint;
  *   - `foreachBatch` installs [[IndexMaintenance.applyEpoch]]: the
  *     per-epoch `wap-id` transaction that no-ops a fully-applied
  *     replay, discards a torn stage before retrying, and refuses a
  *     partial overlap — at-least-once delivery from the checkpoint
  *     plus an idempotent epoch body is the exactly-once the index
  *     needs (the Structured Streaming sink contract, stated in the
  *     foreachBatch docs, resolved the same way Iceberg's wap-id
  *     streaming commits resolve it);
  *   - the staleness fences advance inside each epoch's transaction,
  *     so a crash BETWEEN epochs leaves a servable, fence-fresh index
  *     covering every published epoch — never a torn one.
  *
  * At 100 TB: per-epoch cost is the batch tokenize/shingle + five
  * bounded appends + the index-grain norms refold (the
  * [[IndexMaintenance]] scale argument, unchanged — the stream just
  * decides WHEN epochs happen). Backlog drain parallelizes inside each
  * micro-batch, not across them: epochs serialize through the
  * transaction by design, because each audit reads the prior corpus
  * state. The knob that matters at scale is epoch SIZE (files per
  * trigger), trading per-epoch overhead against index freshness.
  *
  * Entry universe: the managed corpus starts at `%13 ∉ {5,6}` and the
  * stream delivers class 6 split across two epoch files, so the final
  * corpus is exactly `%13 ≠ 5` — the SAME universe (and the same
  * DuckDB oracle) as the batch maintenance entry, making batch/stream
  * equivalence itself oracle-checked. */
object StreamingIngest {

  private val AppendClass = 6
  private val Epochs = 2

  def basePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_ingest_stream", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Stage the class-6 arrival files once (deterministic content: two
    * range-split parquet files). The `_SUCCESS` marker gates a torn
    * write — a half-written epoch dir rewrites from scratch. */
  private[streaming] def ensureEpochFiles(s: SparkSession, dir: String, base: String): String = {
    val ep = s"$base/epochs"
    if (!Files.isRegularFile(Paths.get(ep, "_SUCCESS"))) {
      graft.llm.IndexFence.rmTree(Paths.get(ep))
      Tables(s, dir).documents
        .filter(col("doc_id") % 13 === AppendClass)
        .repartitionByRange(Epochs, col("doc_id"))
        .write.mode("overwrite").parquet(ep)
    }
    ep
  }

  /** Drain the arrival backlog through the per-epoch transaction.
    * Restart-safe by construction: the checkpoint remembers processed
    * files, [[IndexMaintenance.applyEpoch]] makes the replayed edge
    * epoch idempotent. Returns the number of epochs that APPLIED (0 on
    * a fully-caught-up restart). */
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
        if (IndexMaintenance.applyEpoch(s, base, batch, epochId))
          applied.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    applied.get()
  }

  /** Oracle-gated: BM25 serve from the STREAM-maintained text index.
    * The served universe is `%13 ≠ 5` — identical to the batch
    * maintenance entry, so the same oracle replays it; what this entry
    * adds to the gate is the delivery path (checkpointed stream, two
    * epochs, per-epoch WAP transactions). Re-runs drain an empty
    * backlog and serve — idempotent. */
  def textIngestStream: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = IndexMaintenance.ensureBaseAt(s, dir, basePath(dir))
    runIngest(s, dir, base)
    TextIndex.serve(s, IndexMaintenance.textPath(base),
      Seq("dup", "spark", "window"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_ingest_stream" -> textIngestStream)

  val oracleSql: Map[String, String] = Map(
    "text_ingest_stream" -> IndexMaintenance.textIndexAppendSql)
}
