package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Torn-publish recovery (advisor r16): multi-table WAP transactions
  * publish their tables sequentially, so a crash inside the publish
  * loop used to leave the transaction half-visible — corpus rows
  * published, index rows still staged, fence behind — with a full
  * rebuild as the only recovery. The roll-forward contract
  * ([[ManifestFileSink.wapRollForward]]): stage order == publish order,
  * head table first, so a wap id staged on a later table but consumed
  * on the head is exact evidence the commit decision was taken — the
  * recovery FINISHES the publish (restoring the ORIGINAL decision, not
  * recomputing one) and re-derives norms/fences. These cases pin every
  * crash window the advisor named, on both index families. */
class TornPublishSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-torn-dir").toString
    for (t <- Seq("embeddings", "documents"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
    d
  }

  private def tmpBase(tag: String): String =
    Files.createTempDirectory(s"graft-torn-$tag").toString

  private def readT(p: String): DataFrame =
    spark.read.format(fmt).option("path", p).load()

  test("wapRollForward publishes exactly the mid-publish suffix, in table order") {
    import spark.implicits._
    val tables = (1 to 3).map(i => tmpBase(s"rf$i") + s"/t$i")
    val rows = Seq((1L, "x")).toDF("id", "v")
    tables.foreach { p =>
      rows.write.format(fmt).option("path", p).mode("append").save() // main line
      rows.write.format(fmt).option("path", p).option("wap-id", "tx")
        .mode("append").save() // staged
    }
    // Simulated crash: publish consumed table 1's stage, died before 2/3.
    ManifestFileSink.wapPublish(tables.head, "tx")
    assert(ManifestFileSink.wapRollForward(tables) === Seq("tx"))
    tables.foreach(p => assert(readT(p).count() === 2, s"$p must hold both rows"))
    // Idempotent: nothing left to finish.
    assert(ManifestFileSink.wapRollForward(tables) === Seq.empty)
    // A mid-STAGE crash (head still staged) is NOT rolled forward — the
    // discard-then-retry path owns it.
    val t4 = tmpBase("rf4") + "/t4"
    rows.write.format(fmt).option("path", t4).option("wap-id", "tx2")
      .mode("append").save()
    assert(ManifestFileSink.wapRollForward(Seq(t4, tables.last)) === Seq.empty)
  }

  test("vector: crash between the two publishes rolls forward on replay") {
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir, tmpBase("vec"))
    val ct = VectorMaintenance.corpusTable(base)
    val ip = VectorMaintenance.vecPath(base)
    val batch = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 13 === 6)
    val wapId = "vecingest-e0"
    // Replicate ingestAppend's staging, then crash after the FIRST
    // publish (the corpus table) — the advisor's medium scenario.
    batch.select(col("vec_id"),
        VectorIndex.enc(transform(col("embedding"), _.cast("double"))).as("embenc"))
      .write.format(fmt).option("path", ct).option("wap-id", wapId)
      .mode("append").save()
    VectorIndex.assignNew(spark, ip, batch)
      .write.format(fmt).option("path", s"$ip/assigned").option("wap-id", wapId)
      .mode("append").save()
    ManifestFileSink.wapPublish(ct, wapId)
    spark.catalog.refreshByPath(ct)
    assert(IndexFence.staleness(ip).contains(true),
      "the torn window reads as stale until recovered")
    // The stream replays the epoch: roll-forward completes it (so the
    // call reports the epoch as applied), the assigned table holds the
    // batch, and the fence is re-advanced — no rebuild, no silent loss.
    assert(VectorMaintenance.applyEpoch(spark, base, batch, 0L))
    assert(IndexFence.staleness(ip).contains(false))
    val corpusIds = readT(ct).select("vec_id").collect().map(_.getLong(0)).toSet
    val assignedIds = readT(s"$ip/assigned").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(assignedIds === corpusIds)
    assert(batch.select("vec_id").collect().map(_.getLong(0)).toSet
      .subsetOf(assignedIds))
    // And the replay after recovery is a plain no-op.
    assert(!VectorMaintenance.applyEpoch(spark, base, batch, 0L))
    assert(VectorIndex.serve(spark, ip, 1).count() > 0)
  }

  test("vector: crash between last publish and fence write reconciles, no rebuild") {
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir, tmpBase("vecfp"))
    val ct = VectorMaintenance.corpusTable(base)
    val ip = VectorMaintenance.vecPath(base)
    val batch = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 13 === 6)
    VectorMaintenance.ingestAppend(spark, base, batch)
    // Simulated crash window: both tables published (content consistent)
    // but the fence write was lost — rewind it to a bogus fingerprint.
    IndexFence.write(ip, ct, 12345L)
    assert(IndexFence.staleness(ip).contains(true))
    val preFiles = new java.io.File(s"$ip/assigned").listFiles().map(_.getName).toSet
    // The replay reconciles via the content audit (corpus ≡ assigned)
    // instead of refusing or rebuilding.
    assert(!VectorMaintenance.applyEpoch(spark, base, batch, 0L))
    assert(IndexFence.staleness(ip).contains(false))
    assert(new java.io.File(s"$ip/assigned").listFiles().map(_.getName).toSet
      === preFiles, "reconcile must not rewrite any index file")
  }

  test("vector: ledger-only staged state recovers the ORIGINAL decision row") {
    import spark.implicits._
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir, tmpBase("vecled"))
    val ct = VectorMaintenance.corpusTable(base)
    val ip = VectorMaintenance.vecPath(base)
    val lt = IndexMaintenance.ledgerTable(base)
    val batch = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 13 === 6)
    val total = batch.count()
    val wapId = "veccurate-e0"
    // Manufacture the advisor's low scenario: the original run decided
    // admit-all, published corpus + assigned, crashed before the ledger
    // publish. (A recompute on replay could decide differently — the
    // staged row is the proof the recovery restores the DECISION, not a
    // re-derivation.)
    batch.select(col("vec_id"),
        VectorIndex.enc(transform(col("embedding"), _.cast("double"))).as("embenc"))
      .write.format(fmt).option("path", ct).option("wap-id", wapId)
      .mode("append").save()
    VectorIndex.assignNew(spark, ip, batch)
      .write.format(fmt).option("path", s"$ip/assigned").option("wap-id", wapId)
      .mode("append").save()
    Seq((0L, total, 0L)).toDF("epoch", "admitted", "rejected")
      .write.format(fmt).option("path", lt).option("wap-id", wapId)
      .mode("append").save()
    ManifestFileSink.wapPublish(ct, wapId)
    ManifestFileSink.wapPublish(s"$ip/assigned", wapId)
    spark.catalog.refreshByPath(ct)
    // Replay: roll-forward publishes the staged ledger row and reports
    // the epoch decided; the decision record is the original one.
    assert(VectorMaintenance.curateVecEpoch(spark, base, batch, 0L))
    val ledger = readT(lt).orderBy(col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ledger === Seq((0L, total, 0L)),
      "the recovered ledger row must be the staged original, not a recompute")
    assert(IndexFence.staleness(ip).contains(false))
    assert(!VectorMaintenance.curateVecEpoch(spark, base, batch, 0L))
  }

  test("gated epochs refuse out-of-order delivery, both families") {
    val dir = freshDir()
    val vbase = VectorMaintenance.ensureBaseAt(spark, dir, tmpBase("vecord"))
    val vb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 13 === 6)
    val ev = intercept[IllegalStateException](
      VectorMaintenance.curateVecEpoch(spark, vbase, vb, 1L))
    assert(ev.getMessage.contains("must decide in order"))
    val tbase = IndexMaintenance.ensureBaseAt(spark, dir, tmpBase("txtord"))
    val tb = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 === 6)
    val et = intercept[IllegalStateException](
      IndexMaintenance.curateEpoch(spark, tbase, tb, 1L))
    assert(et.getMessage.contains("must decide in order"))
  }

  test("text: mid-publish crash rolls forward with norms refold on replay") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBaseAt(spark, dir, tmpBase("txt"))
    val ct = IndexMaintenance.corpusTable(base)
    val tp = IndexMaintenance.textPath(base)
    val dp = IndexMaintenance.dedupPath(base)
    val batch = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 === 6)
    val wapId = "ingest-e0"
    // Replicate ingestAppend's nine stages, then crash after publishing
    // only the first two tables.
    val bPost = TextIndex.postingRows(batch)
    val bPass = TextIndex.passageRows(batch)
    val bSh = Dedup.shingleRows(batch)
    def stage(df: DataFrame, p: String): Unit =
      df.write.format(fmt).option("path", p).option("wap-id", wapId)
        .mode("append").save()
    stage(batch, ct)
    stage(bPost, s"$tp/postings")
    stage(TextIndex.statsRow(bPost), s"$tp/stats")
    stage(TextIndex.dfPartRows(bPost), s"$tp/dfparts")
    stage(bPass, s"$tp/passages")
    stage(TextIndex.pstatsRow(bPass), s"$tp/pstats")
    stage(TextIndex.pdfPartRows(bPass), s"$tp/pdfparts")
    stage(DedupIndex.bandTableRows(bSh), s"$dp/bands")
    stage(DedupIndex.shingleTableRows(bSh), s"$dp/shingles")
    ManifestFileSink.wapPublish(ct, wapId)
    ManifestFileSink.wapPublish(s"$tp/postings", wapId)
    spark.catalog.refreshByPath(ct)
    assert(IndexFence.staleness(tp).contains(true))
    // Replay: roll-forward finishes stats/bands/shingles, refolds the
    // norms, re-advances both fences — and reports the epoch applied.
    assert(IndexMaintenance.applyEpoch(spark, base, batch, 0L))
    assert(IndexFence.staleness(tp).contains(false))
    assert(IndexFence.staleness(dp).contains(false))
    assert(!IndexMaintenance.applyEpoch(spark, base, batch, 0L))
    // Serve from the recovered index ≡ serve from a base maintained the
    // clean way (same corpus, same batch, no crash).
    val clean = IndexMaintenance.ensureBaseAt(spark, dir, tmpBase("txtclean"))
    IndexMaintenance.ingestAppend(spark, clean, batch)
    val terms = Seq("dup", "spark", "window")
    val got = TextIndex.serve(spark, tp, terms).collect().toSeq
    val want = TextIndex.serve(spark,
      IndexMaintenance.textPath(clean), terms).collect().toSeq
    assert(got === want)
  }
}
