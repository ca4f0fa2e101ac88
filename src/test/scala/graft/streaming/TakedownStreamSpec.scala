package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.llm.{IndexFence, IndexMaintenance, TextIndex}
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The takedown STREAM: delete windows delivered through a checkpointed
  * file source, each applied via the ten-table WAP retraction — replays
  * no-op on masked victims, a mid-stream kill/restart converges to the
  * batch delete's exact end state, and a caught-up re-run retracts
  * nothing. */
class TakedownStreamSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-takedown-dir").toString
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
    d
  }

  private def maintainedBase(dir: String): String = {
    val base = IndexMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-takedown-base").toString)
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    base
  }

  test("streamed takedowns converge to the batch delete's end state") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    assert(TakedownStream.runTakedowns(spark, dir, base) === 2L)
    val tp = IndexMaintenance.textPath(base)
    assert(IndexFence.staleness(tp).contains(false))
    // End state ≡ ONE batch delete of the union window.
    val ref = maintainedBase(dir)
    assert(IndexMaintenance.deleteRange(spark, ref, 100L, 300L) > 0)
    val terms = Seq("dup", "spark", "window")
    assert(TextIndex.serve(spark, tp, terms).collect().toSeq ===
      TextIndex.serve(spark, IndexMaintenance.textPath(ref), terms)
        .collect().toSeq)
    // The ledger recorded the two windows, once each.
    val dels = spark.read.format(fmt)
      .option("path", IndexMaintenance.delsTable(base)).load()
      .orderBy(col("del_lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dels === Seq((100L, 200L), (200L, 300L)))
    // Caught-up re-run: drains nothing, retracts nothing.
    assert(TakedownStream.runTakedowns(spark, dir, base) === 0L)
  }

  test("vector takedown stream converges to the batch vector delete") {
    val dir = freshDir()
    val base = graft.llm.VectorMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-vectakedown-base").toString)
    graft.llm.VectorMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 13 === 6))
    assert(TakedownStream.runVecTakedowns(spark, dir, base) === 2L)
    val ip = graft.llm.VectorMaintenance.vecPath(base)
    assert(IndexFence.staleness(ip).contains(false))
    val ref = graft.llm.VectorMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-vectakedown-ref").toString)
    graft.llm.VectorMaintenance.ingestAppend(spark, ref,
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 13 === 6))
    assert(graft.llm.VectorMaintenance.deleteRange(spark, ref, 100L, 300L) > 0)
    assert(graft.llm.VectorIndex.serve(spark, ip, 1).collect().toSeq ===
      graft.llm.VectorIndex.serve(spark,
        graft.llm.VectorMaintenance.vecPath(ref), 1).collect().toSeq)
    assert(TakedownStream.runVecTakedowns(spark, dir, base) === 0L)
  }

  test("mid-stream kill + restart replays the edge window as a no-op") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    val ep = TakedownStream.ensureOrderFiles(spark, base)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select(col("del_lo"), col("del_hi")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
          .foreach { case (lo, hi) =>
            IndexMaintenance.deleteRange(spark, base, lo, hi) }
        // Kill AFTER the first window applied but BEFORE the
        // checkpoint acks it — the restart must replay it.
        if (seen.incrementAndGet() == 1)
          throw new RuntimeException("simulated mid-stream kill")
        ()
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    // Restart drains the backlog: the replayed window no-ops (masked
    // victims), the unprocessed one applies — at most one window can
    // still retract.
    assert(TakedownStream.runTakedowns(spark, dir, base) <= 1L)
    val dels = spark.read.format(fmt)
      .option("path", IndexMaintenance.delsTable(base)).load()
      .orderBy(col("del_lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dels === Seq((100L, 200L), (200L, 300L)),
      "each window's ledger row must appear exactly once across the replay")
    val ct = IndexMaintenance.corpusTable(base)
    assert(spark.read.format(fmt).option("path", ct).load()
      .filter(col("doc_id") >= 100 && col("doc_id") < 300).isEmpty)
  }

  test("overlapping orders in one micro-batch coalesce instead of poisoning the feed (advice-r18 #2)") {
    // Two independent legal orders with overlapping ranges: the previous
    // sequential loop handled these; the batched path must coalesce them
    // into the interval union, not throw deleteRanges' disjointness
    // require() inside foreachBatch (which would fail the query and
    // replay the same poisoned batch forever).
    import spark.implicits._
    assert(TakedownStream.coalesceOverlaps(
      Seq((200L, 300L), (100L, 250L), (400L, 450L), (100L, 250L))) ===
      Seq((100L, 300L), (400L, 450L)))
    // Adjacency is legal input downstream — must NOT merge (keeps the
    // per-order ledger rows).
    assert(TakedownStream.coalesceOverlaps(Seq((100L, 200L), (200L, 300L))) ===
      Seq((100L, 200L), (200L, 300L)))
    // Nested windows collapse to the outer one.
    assert(TakedownStream.coalesceOverlaps(Seq((100L, 400L), (150L, 200L))) ===
      Seq((100L, 400L)))

    val dir = freshDir()
    val base = maintainedBase(dir)
    val batch = Seq((100L, 250L), (200L, 300L)).toDF("del_lo", "del_hi")
    assert(TakedownStream.applyOrders(spark, base, batch) === 1L,
      "the overlapping pair applies as one union window")
    // End state ≡ one batch delete of the union.
    val ref = maintainedBase(dir)
    assert(IndexMaintenance.deleteRange(spark, ref, 100L, 300L) > 0)
    val terms = Seq("dup", "spark", "window")
    assert(TextIndex.serve(spark, IndexMaintenance.textPath(base), terms)
      .collect().toSeq ===
      TextIndex.serve(spark, IndexMaintenance.textPath(ref), terms)
        .collect().toSeq)
    // The union row is the audit record.
    val dels = spark.read.format(fmt)
      .option("path", IndexMaintenance.delsTable(base)).load()
      .orderBy(col("del_lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dels === Seq((100L, 300L)))
  }
}
