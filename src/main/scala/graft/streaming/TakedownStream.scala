package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.{DedupIndex, IndexMaintenance, TextIndex}

/** STREAMING takedowns — the delete verb's arrival path, closing the
  * stream × verb matrix ([[StreamingIngest]] delivers appends,
  * [[CurationStream]] gated appends; this delivers RETRACTIONS): delete
  * windows arrive as a checkpointed file stream (one takedown order per
  * file, `(del_lo, del_hi)` rows), and each micro-batch applies its
  * windows through [[IndexMaintenance.deleteRange]] — the ten-table WAP
  * retraction transaction, unchanged.
  *
  * Exactly-once under replay comes from the verb itself: a replayed
  * window finds only masked victims and no-ops (the deletion vectors
  * ARE the applied-marker, the way corpus membership is for appends),
  * and the retraction ledger records each applied window exactly once
  * because deleteRange only stages a ledger row when victims exist.
  * A crash inside a window's transaction recovers by the standard
  * roll-forward/discard machinery one layer down.
  *
  * At 100 TB this is the production takedown feed: legal/GDPR orders
  * arrive continuously, each costs one victim-window-bounded
  * transaction, and the corpus never pays a rebuild. Epoch ordering is
  * NOT load-bearing here (unlike the gated curation chain): deletes of
  * disjoint windows commute, so file-arrival order can be anything. */
object TakedownStream {

  private val AppendClass = 6

  def basePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_takedown", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Stage the takedown orders once: TWO window files — `[100, 200)`
    * and `[200, 300)` — whose union is the standard retraction window,
    * so the streamed end state replays the batch delete entry's oracle
    * exactly. `_SUCCESS` gates a torn write. */
  private[streaming] def ensureOrderFiles(s: SparkSession, base: String): String = {
    val ep = s"$base/orders"
    if (!Files.isRegularFile(Paths.get(ep, "_SUCCESS"))) {
      graft.llm.IndexFence.rmTree(Paths.get(ep))
      import s.implicits._
      Seq((100L, 200L), (200L, 300L)).toDF("del_lo", "del_hi")
        .repartitionByRange(2, col("del_lo"))
        .write.mode("overwrite").parquet(ep)
    }
    ep
  }

  /** Normalize a micro-batch's raw order list into the sorted DISJOINT
    * window sequence [[IndexMaintenance.deleteRanges]] requires
    * (advice-r18 #2): two independent legal orders may overlap —
    * `.distinct` only removes exact duplicates, and an overlap inside
    * `foreachBatch` would throw, fail the query, and poison the
    * checkpoint into replaying the same batch forever. Overlapping
    * windows merge into their interval UNION (retraction of a union ≡
    * retractions of the parts: deletes commute and masked victims
    * no-op), so the merged ledger row is the union window — the audit
    * trail records what was retracted in this transaction, and the raw
    * per-order feed remains in the checkpointed source files.
    * Touching-but-not-overlapping windows stay separate (deleteRanges
    * accepts adjacency), keeping their individual ledger rows. */
  private[streaming] def coalesceOverlaps(ws: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ws.distinct.sortBy(identity).foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: acc, (l, h)) if l < hi => (lo, math.max(hi, h)) :: acc
      case (acc, w) => w :: acc
    }.reverse

  /** Apply one micro-batch of takedown orders as ONE batched
    * transaction (verdict-r17 Next #2): K windows in a micro-batch
    * used to pay K ten-table transactions and K norms refolds where
    * one of each suffices — [[IndexMaintenance.deleteRanges]] stages
    * every window under one wap id with one refold and one ledger
    * batch (one ledger row per disjoint window after
    * [[coalesceOverlaps]], so each order stays individually auditable
    * unless orders overlap — then the union row is the audit record).
    * Windows sort by (del_lo, del_hi) for determinism; the bounded
    * collect is the order list itself — takedown feeds are
    * metadata-grain by nature (a window per legal order, never per
    * document). Returns windows that retracted anything. */
  private[streaming] def applyOrders(s: SparkSession, base: String, batch: DataFrame): Long = {
    val windows = coalesceOverlaps(batch.select(col("del_lo"), col("del_hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    if (windows.isEmpty) 0L
    else IndexMaintenance.deleteRanges(s, base, windows).count(_ > 0).toLong
  }

  /** Drain the takedown backlog. The whole available backlog lands in
    * one micro-batch (no per-file trigger cap), so a drain pays ONE
    * batched transaction — the refold amortization [[applyOrders]]
    * documents. Returns windows that applied (0 on a fully-caught-up
    * restart). */
  def runTakedowns(s: SparkSession, dir: String, base: String): Long = {
    val ep = ensureOrderFiles(s, base)
    val applied = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream
      .schema(s.read.parquet(ep).schema)
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applied.addAndGet(applyOrders(s, base, batch))
        ()
      }
      .start()
    q.awaitTermination()
    applied.get()
  }

  /** Oracle-gated: BM25 serve after the takedown stream drains — the
    * base is built + class-6 appended (the maintained universe), then
    * the two streamed windows retract `[100, 300)` in two per-window
    * WAP transactions, so the batch delete entry's oracle replays the
    * end state exactly. Re-runs drain an empty backlog, find masked
    * victims, and serve — idempotent. */
  def textTakedownStream: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = IndexMaintenance.ensureBaseAt(s, dir, basePath(dir))
    if (!IndexMaintenance.batchApplied(s, base)) {
      IndexMaintenance.ingestAppend(s, base,
        graft.sources.Tables(s, dir).documents
          .filter(col("doc_id") % 13 === AppendClass))
      s.catalog.refreshByPath(IndexMaintenance.corpusTable(base))
    }
    runTakedowns(s, dir, base)
    TextIndex.serve(s, IndexMaintenance.textPath(base),
      Seq("dup", "spark", "window"))
  }

  // ------------------------------------------- vector takedown feed

  def vecBasePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_vectakedown", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Drain the takedown backlog against a VECTOR base — the same
    * window files, applied through [[graft.llm.VectorMaintenance
    * .deleteRange]]'s two-table retraction. */
  def runVecTakedowns(s: SparkSession, dir: String, base: String): Long = {
    val ep = ensureOrderFiles(s, base)
    val applied = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream
      .schema(s.read.parquet(ep).schema)
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Same overlap discipline as [[applyOrders]] — the vector
        // deleteRanges has the identical disjointness require().
        val windows = coalesceOverlaps(batch.select(col("del_lo"), col("del_hi"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
        if (windows.nonEmpty) applied.addAndGet(
          graft.llm.VectorMaintenance.deleteRanges(s, base, windows)
            .count(_ > 0).toLong)
        ()
      }
      .start()
    q.awaitTermination()
    applied.get()
  }

  /** Oracle-gated: the vector sibling — base trained + class-6
    * appended, the two streamed windows retract `[100, 300)`, serve
    * under the frozen base-trained centroids replays the batch vector
    * delete's oracle exactly. */
  def vecTakedownStream: (SparkSession, String) => DataFrame = (s, dir) => {
    import graft.llm.{VectorIndex, VectorMaintenance}
    val base = VectorMaintenance.ensureBaseAt(s, dir, vecBasePath(dir))
    if (!VectorMaintenance.batchApplied(s, base)) {
      VectorMaintenance.ingestAppend(s, base,
        graft.sources.Tables(s, dir).embeddings
          .filter(col("vec_id") % 13 === AppendClass))
      s.catalog.refreshByPath(VectorMaintenance.corpusTable(base))
    }
    runVecTakedowns(s, dir, base)
    VectorIndex.serve(s, VectorMaintenance.vecPath(base), nprobe = 1)
  }

  /** Oracle-gated: near-dup probe against the DEDUP side of the same
    * takedown-streamed base — the delivery leg completed for the
    * maintenance trilogy's third index: [[IndexMaintenance.deleteRanges]]
    * retracts from all ten tables (bands and shingles included) in the
    * one streamed transaction, so the streamed windows' victims must
    * vanish from the candidate pairs exactly as the batch delete entry's
    * oracle replays (a probe whose masked partner still surfaced would
    * be a hash miss). Shares the text stream's base and backlog — the
    * entries compose in either order because the drain is idempotent
    * (an already-caught-up checkpoint applies nothing, masked victims
    * no-op). */
  def dedupTakedownStream: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = IndexMaintenance.ensureBaseAt(s, dir, basePath(dir))
    if (!IndexMaintenance.batchApplied(s, base)) {
      IndexMaintenance.ingestAppend(s, base,
        graft.sources.Tables(s, dir).documents
          .filter(col("doc_id") % 13 === AppendClass))
      s.catalog.refreshByPath(IndexMaintenance.corpusTable(base))
    }
    runTakedowns(s, dir, base)
    DedupIndex.serve(s, IndexMaintenance.dedupPath(base),
      graft.sources.Tables(s, dir).documents
        .filter(col("doc_id") % 13 === IndexMaintenance.ProbeClass))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_takedown_stream" -> textTakedownStream,
    "dedup_takedown_stream" -> dedupTakedownStream,
    "vec_takedown_stream" -> vecTakedownStream)

  val oracleSql: Map[String, String] = Map(
    "text_takedown_stream" -> IndexMaintenance.textIndexDeleteSql,
    // Same end state as the batch dedup delete: the stream retracts the
    // identical windows from the identical base.
    "dedup_takedown_stream" -> IndexMaintenance.dedupIndexDeleteSql,
    "vec_takedown_stream" -> graft.llm.VectorMaintenance.vecIndexDeleteSql)
}
