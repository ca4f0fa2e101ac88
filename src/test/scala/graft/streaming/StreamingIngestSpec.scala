package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.llm.{DedupIndex, IndexMaintenance, TextIndex}
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** The streaming-maintenance contract (verdict-r15 Next #4): each
  * micro-batch runs the five-table WAP ingest transaction; a replayed
  * epoch is exactly-once by idempotence (fully-applied → no-op, torn
  * stage → discarded and retried, partial overlap → refused); a
  * mid-stream kill/restart converges to the same admitted set and the
  * same index row counts as an uninterrupted run. */
class StreamingIngestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-stream-dir").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def docs(dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def corpusCount(base: String): Long =
    spark.read.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base)).load().count()

  test("epoch replay idempotence: fully-applied no-op, torn stage discarded, partial refused") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-stream-base").toString)
    val c6 = docs(dir).filter(col("doc_id") % 13 === 6)
    val e0 = c6.filter(expr("(doc_id div 13) % 2 = 0"))
    val e1 = c6.filter(expr("(doc_id div 13) % 2 = 1"))
    val pre = corpusCount(base)

    // Epoch 0 applies.
    assert(IndexMaintenance.applyEpoch(spark, base, e0, 0L))
    val afterE0 = corpusCount(base)
    assert(afterE0 === pre + e0.count())
    // REPLAY of epoch 0 (crash after publish, before the checkpoint
    // ack): every id already present → no-op, nothing grows, fence
    // stays fresh.
    assert(!IndexMaintenance.applyEpoch(spark, base, e0, 0L))
    assert(corpusCount(base) === afterE0)
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(false))

    // TORN STAGE: a crashed attempt left epoch 1's rows staged but
    // unpublished. The retry must discard the leftover and land the
    // batch exactly once.
    e1.write.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base))
      .option("wap-id", "ingest-e1").mode("append").save()
    assert(corpusCount(base) === afterE0, "staged rows are invisible")
    assert(IndexMaintenance.applyEpoch(spark, base, e1, 1L))
    assert(corpusCount(base) === afterE0 + e1.count(),
      "the torn stage must not double the batch")

    // PARTIAL overlap (a batch straddling an applied boundary): refuse.
    val straddle = c6.limit(1).unionByName(
      docs(dir).filter(col("doc_id") % 13 === 5).limit(1))
    val e = intercept[IllegalStateException](
      IndexMaintenance.applyEpoch(spark, base, straddle, 2L))
    assert(e.getMessage.contains("already in the corpus"))
  }

  test("mid-stream kill + restart converges to the uninterrupted result") {
    val dir = freshDir()
    val base = Files.createTempDirectory("graft-stream-kill").toString
    IndexMaintenance.ensureBaseAt(spark, dir, base)
    val ep = StreamingIngest.ensureEpochFiles(spark, dir, base)
    // First run: kill the query after ONE epoch lands (the crash window
    // where the publish committed but the checkpoint ack did not).
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        IndexMaintenance.applyEpoch(spark, base, b, id)
        if (seen.incrementAndGet() == 1)
          throw new RuntimeException("simulated mid-stream kill")
        ()
      }
      .start()
    intercept[StreamingQueryException](q.awaitTermination())
    val midCount = corpusCount(base)
    // Restart: the checkpoint replays the unacknowledged epoch (its
    // applyEpoch no-ops) and drains the rest.
    StreamingIngest.runIngest(spark, dir, base)
    assert(corpusCount(base) > midCount, "the remaining epoch must land")
    // Same admitted set as the batch-maintained universe: exactly
    // %13 != 5, every id exactly once.
    val expect = docs(dir).filter(col("doc_id") % 13 =!= 5)
    val corpus = spark.read.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base)).load()
    assert(corpus.count() === expect.count())
    assert(corpus.select(countDistinct(col("doc_id"))).head.getLong(0) ===
      corpus.count(), "no doc admitted twice across the kill/restart")
    // Same index row counts + served ranking as a clean full rebuild.
    val tFull = Files.createTempDirectory("graft-stream-tfull").toString
    TextIndex.buildFrom(spark, expect, s"$dir/documents.parquet", tFull)
    val served = TextIndex.serve(spark, IndexMaintenance.textPath(base),
      Seq("dup", "spark", "window"))
    assert(served.collect().toSeq ===
      TextIndex.serve(spark, tFull, Seq("dup", "spark", "window")).collect().toSeq)
    def rows(p: String): Long =
      spark.read.format(fmt).option("path", p).load().count()
    assert(rows(s"${IndexMaintenance.textPath(base)}/postings") ===
      rows(s"$tFull/postings"),
      "stream-maintained postings must hold exactly the rebuild's rows")
    // A fully-caught-up re-run drains nothing and stays servable (the
    // entry's idempotence across bench re-runs).
    assert(StreamingIngest.runIngest(spark, dir, base) === 0L)
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(false))
  }

  test("dedup index is maintained by the same epochs (five-table transaction)") {
    val dir = freshDir()
    val base = Files.createTempDirectory("graft-stream-dedup").toString
    IndexMaintenance.ensureBaseAt(spark, dir, base)
    StreamingIngest.runIngest(spark, dir, base)
    val expect = docs(dir).filter(col("doc_id") % 13 =!= 5)
    val dFull = Files.createTempDirectory("graft-stream-dfull").toString
    DedupIndex.buildFrom(spark, expect, s"$dir/documents.parquet", dFull)
    val probe = docs(dir).filter(col("doc_id") % 13 === 5)
    assert(DedupIndex.serve(spark, IndexMaintenance.dedupPath(base), probe)
      .collect().toSeq ===
      DedupIndex.serve(spark, dFull, probe).collect().toSeq)
  }
}
