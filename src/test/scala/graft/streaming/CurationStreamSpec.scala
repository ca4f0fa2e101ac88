package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.llm.{Dedup, DedupIndex, IndexMaintenance, TextAnalysis, TextIndex}
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The gated streaming-admission contract: per-epoch near-dup reject +
  * within-epoch keep-first + quality gate, decision atomic with its
  * effects (ledger row in the same WAP publish), sequential dependence
  * across epochs, replay idempotence via the ledger, and index
  * consistency (stream-maintained text index ≡ rebuild over the
  * admitted universe). */
class CurationStreamSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-curstream-dir").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def docs(dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def corpusIds(base: String): Set[Long] =
    spark.read.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base)).load()
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

  /** The gate's expected admits for one epoch, computed eagerly against
    * an explicit standing-corpus id set — the sequential reference the
    * stream must converge to. */
  private def expectedAdmits(dir: String, standing: Set[Long],
      epoch: DataFrame): Set[Long] = {
    val all = docs(dir)
    val sh = Dedup.shingleRows(all).persist()
    val sizes = sh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("i")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (d1, d2, i) =>
        i.toDouble / (sizes(d1) + sizes(d2) - i) >= 0.8 }
    val epochIds = epoch.select("doc_id").collect().map(_.getLong(0)).toSet
    val dropped = pairs.collect {
      case (d1, d2, _) if epochIds(d2) &&
        (standing(d1) || (epochIds(d1) && d1 < d2)) => d2
    }.toSet
    val qual = docs(dir)
      .withColumn("wl", split(col("text"), " "))
      .withColumn("cw", (size(col("wl")) - TextAnalysis.cnt(col("wl"), "the")
        - TextAnalysis.cnt(col("wl"), "a")).cast("long"))
      .filter(expr("(1000000L * cw) div n_chars") > lit(TextAnalysis.QcThreshold))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    sh.unpersist()
    (epochIds -- dropped).filter(qual)
  }

  test("gated epochs admit exactly the sequential reference; ledger decides replays") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-curstream-base").toString)
    val c6 = docs(dir).filter(col("doc_id") % 13 === 6)
    val e0 = c6.filter(expr("(doc_id div 13) % 2 = 0"))
    val e1 = c6.filter(expr("(doc_id div 13) % 2 = 1"))
    val base0 = corpusIds(base)

    assert(IndexMaintenance.curateEpoch(spark, base, e0, 0L))
    val adm0 = corpusIds(base) -- base0
    assert(adm0 === expectedAdmits(dir, base0, e0))
    // Replay of a DECIDED epoch: the ledger answers, nothing changes —
    // even though (unlike the plain append) rejected docs left no
    // corpus trace to detect the replay by.
    assert(!IndexMaintenance.curateEpoch(spark, base, e0, 0L))
    assert(corpusIds(base) -- base0 === adm0)

    // Epoch 1 gates against base ∪ admitted(0) — the sequential edge.
    assert(IndexMaintenance.curateEpoch(spark, base, e1, 1L))
    val adm1 = corpusIds(base) -- base0 -- adm0
    assert(adm1 === expectedAdmits(dir, base0 ++ adm0, e1))

    // Both fences fresh; the maintained text index equals a rebuild
    // over the admitted universe (rejects are ABSENT from the index).
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(false))
    val admitted = docs(dir).filter(
      col("doc_id").isin((base0 ++ adm0 ++ adm1).toSeq: _*))
    val tFull = Files.createTempDirectory("graft-curstream-tfull").toString
    TextIndex.buildFrom(spark, admitted, s"$dir/documents.parquet", tFull)
    val terms = Seq("dup", "spark", "window")
    assert(TextIndex.serve(spark, IndexMaintenance.textPath(base), terms)
      .collect().toSeq ===
      TextIndex.serve(spark, tFull, terms).collect().toSeq)
    val dFull = Files.createTempDirectory("graft-curstream-dfull").toString
    DedupIndex.buildFrom(spark, admitted, s"$dir/documents.parquet", dFull)
    val probe = docs(dir).filter(col("doc_id") % 13 === 5)
    assert(DedupIndex.serve(spark, IndexMaintenance.dedupPath(base), probe)
      .collect().toSeq ===
      DedupIndex.serve(spark, dFull, probe).collect().toSeq)
  }

  test("mid-stream kill + restart converges; caught-up re-run decides nothing") {
    val dir = freshDir()
    val base = Files.createTempDirectory("graft-curstream-kill").toString
    IndexMaintenance.ensureBaseAt(spark, dir, base)
    val base0 = corpusIds(base)
    val ep = CurationStream.ensureEpochFiles(spark, dir, base)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        IndexMaintenance.curateEpoch(spark, base, b, id)
        if (seen.incrementAndGet() == 1)
          throw new RuntimeException("simulated mid-stream kill")
        ()
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    // Restart drains the remaining epoch (the killed one replays as a
    // ledger no-op) and converges to the sequential reference.
    CurationStream.runIngest(spark, dir, base)
    val c6 = docs(dir).filter(col("doc_id") % 13 === 6)
    val e0 = c6.filter(expr("(doc_id div 13) % 2 = 0"))
    val e1 = c6.filter(expr("(doc_id div 13) % 2 = 1"))
    val adm0 = expectedAdmits(dir, base0, e0)
    val adm1 = expectedAdmits(dir, base0 ++ adm0, e1)
    assert(corpusIds(base) === base0 ++ adm0 ++ adm1)
    // A fully-caught-up re-run decides nothing and changes nothing.
    assert(CurationStream.runIngest(spark, dir, base) === 0L)
    assert(corpusIds(base) === base0 ++ adm0 ++ adm1)
  }

  test("ledger records one row per epoch with the gate's exact counts") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-curstream-ledger").toString)
    val base0 = corpusIds(base)
    val c6 = docs(dir).filter(col("doc_id") % 13 === 6)
    val e0 = c6.filter(expr("(doc_id div 13) % 2 = 0"))
    val e1 = c6.filter(expr("(doc_id div 13) % 2 = 1"))
    assert(IndexMaintenance.curateEpoch(spark, base, e0, 0L))
    assert(IndexMaintenance.curateEpoch(spark, base, e1, 1L))
    val adm0 = expectedAdmits(dir, base0, e0)
    val adm1 = expectedAdmits(dir, base0 ++ adm0, e1)
    val ledger = spark.read.format(fmt)
      .option("path", IndexMaintenance.ledgerTable(base)).load()
      .orderBy(col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ledger === Seq(
      (0L, adm0.size.toLong, e0.count() - adm0.size),
      (1L, adm1.size.toLong, e1.count() - adm1.size)),
      "one ledger row per epoch, counts equal to the replayed gate")
    // A replayed epoch adds no second ledger row.
    assert(!IndexMaintenance.curateEpoch(spark, base, e0, 0L))
    assert(spark.read.format(fmt)
      .option("path", IndexMaintenance.ledgerTable(base)).load().count() === 2L)
  }
}
