package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DELETE maintenance verb (verdict-r16 Next #2): one WAP-staged
  * multi-table commit retracts a document window from the corpus AND
  * every index table — deletion vectors on the per-doc tables, negative
  * stats/df-partial rows for the folded statistics, a retraction-ledger
  * row — and the maintained serve afterwards equals a FULL REBUILD over
  * the survivors, row for row. Replays no-op; a refused audit leaves
  * everything untouched. */
class IndexDeleteSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-del-dir").toString
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
    d
  }

  private def tmpBase(tag: String): String =
    Files.createTempDirectory(s"graft-del-$tag").toString

  private def readT(p: String): DataFrame =
    spark.read.format(fmt).option("path", p).load()

  private def maintainedBase(dir: String): String = {
    val base = IndexMaintenance.ensureBaseAt(spark, dir, tmpBase("b"))
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    base
  }

  test("delete retracts the window everywhere; serve ≡ rebuild over survivors") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    val ct = IndexMaintenance.corpusTable(base)
    val tp = IndexMaintenance.textPath(base)
    val dp = IndexMaintenance.dedupPath(base)
    val preDocs = readT(ct).count()
    val victims = readT(ct)
      .filter(col("doc_id") >= 100 && col("doc_id") < 300).count()
    assert(victims > 0, "the window must hit at every SF")

    val n = IndexMaintenance.deleteRange(spark, base, 100L, 300L)
    assert(n === victims)
    assert(readT(ct).count() === preDocs - victims)
    assert(readT(ct).filter(col("doc_id") >= 100 && col("doc_id") < 300).isEmpty)
    for (t <- Seq(s"$tp/postings", s"$dp/bands", s"$dp/shingles"))
      assert(readT(t).filter(col("doc_id") >= 100 && col("doc_id") < 300).isEmpty,
        s"$t must not serve victim rows")
    // Fences advanced: the delete is maintained drift, still servable.
    assert(IndexFence.staleness(tp).contains(false))
    assert(IndexFence.staleness(dp).contains(false))
    // The retraction ledger records the decision.
    val dels = readT(IndexMaintenance.delsTable(base)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(dels === Seq((100L, 300L, victims)))

    // Serve ≡ rebuild over survivors: BM25 + hybrid from the maintained
    // index vs a fresh index built over the post-delete corpus.
    val terms = Seq("dup", "spark", "window")
    val rebuilt = tmpBase("rebuild")
    TextIndex.buildFrom(spark, readT(ct), ct, rebuilt)
    assert(TextIndex.serve(spark, tp, terms).collect().toSeq ===
      TextIndex.serve(spark, rebuilt, terms).collect().toSeq)
    assert(TextIndex.serveHybrid(spark, tp, terms).collect().toSeq ===
      TextIndex.serveHybrid(spark, rebuilt, terms).collect().toSeq)
    // Dedup probe ≡ rebuild over survivors.
    val probe = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 === 5)
    val dedupRebuilt = tmpBase("dedup-rebuild")
    DedupIndex.buildFrom(spark, readT(ct), ct, dedupRebuilt)
    assert(DedupIndex.serve(spark, dp, probe).collect().toSeq ===
      DedupIndex.serve(spark, dedupRebuilt, probe).collect().toSeq)
  }

  test("replayed delete no-ops: zero retracted, no new ledger row, serve unchanged") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    val tp = IndexMaintenance.textPath(base)
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) > 0)
    val servedOnce = TextIndex.serve(spark, tp, Seq("dup")).collect().toSeq
    val ledgerOnce = readT(IndexMaintenance.delsTable(base)).count()
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) === 0L,
      "a replayed window finds only masked victims")
    assert(readT(IndexMaintenance.delsTable(base)).count() === ledgerOnce)
    assert(TextIndex.serve(spark, tp, Seq("dup")).collect().toSeq === servedOnce)
  }

  test("batched windows: ONE transaction, per-window ledger rows, serve ≡ sequential") {
    val dir = freshDir()
    val windows = Seq((100L, 170L), (180L, 250L), (250L, 300L))
    // Reference: the same windows applied as three sequential deletes.
    val ref = maintainedBase(dir)
    val seqCounts = windows.map { case (lo, hi) =>
      IndexMaintenance.deleteRange(spark, ref, lo, hi) }
    assert(seqCounts.forall(_ > 0), "every window must hit at every SF")

    val base = maintainedBase(dir)
    val ct = IndexMaintenance.corpusTable(base)
    val tp = IndexMaintenance.textPath(base)
    val preCt = ManifestFileSink.publishedManifestCount(ct)
    val prePost = ManifestFileSink.publishedManifestCount(s"$tp/postings")
    val counts = IndexMaintenance.deleteRanges(spark, base, windows)
    assert(counts === seqCounts, "per-window counts must match the sequential verbs")
    // ONE transaction: each table gained exactly ONE published commit
    // (three sequential deletes would gain three) — the refold
    // amortization verdict-r17 Next #2 asks for.
    assert(ManifestFileSink.publishedManifestCount(ct) === preCt + 1)
    assert(ManifestFileSink.publishedManifestCount(s"$tp/postings") === prePost + 1)
    // ... but the ledger still records each order individually.
    val dels = readT(IndexMaintenance.delsTable(base))
      .orderBy(col("del_lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(dels === windows.zip(seqCounts).map { case ((l, h), n) => (l, h, n) })
    // End state ≡ the sequential reference, hash-strict on both serves.
    val terms = Seq("dup", "spark", "window")
    assert(TextIndex.serve(spark, tp, terms).collect().toSeq ===
      TextIndex.serve(spark, IndexMaintenance.textPath(ref), terms)
        .collect().toSeq)
    assert(TextIndex.serveHybrid(spark, tp, terms).collect().toSeq ===
      TextIndex.serveHybrid(spark, IndexMaintenance.textPath(ref), terms)
        .collect().toSeq)
    // A replayed batch finds only masked victims: all-zero, no staging.
    assert(IndexMaintenance.deleteRanges(spark, base, windows) ===
      Seq(0L, 0L, 0L))
    // A PARTIAL replay (one new window, two masked) applies only the new
    // one and ledgers only it.
    val mixed = Seq((100L, 170L), (300L, 320L))
    val mixedCounts = IndexMaintenance.deleteRanges(spark, base, mixed)
    assert(mixedCounts.head === 0L)
    assert(readT(IndexMaintenance.delsTable(base)).count() ===
      windows.size.toLong + (if (mixedCounts(1) > 0) 1L else 0L))
    // Overlapping windows refuse loudly (the commutation contract).
    intercept[IllegalArgumentException] {
      IndexMaintenance.deleteRanges(spark, base, Seq((10L, 30L), (20L, 40L)))
    }
  }

  test("df partials fold negatives: a fully-deleted term vanishes from serve") {
    // Every posting of a term inside the window nets its df to zero —
    // the serve-side guard (df > 0) must drop it instead of dividing
    // by zero in the query weights.
    val dir = freshDir()
    val base = maintainedBase(dir)
    val tp = IndexMaintenance.textPath(base)
    IndexMaintenance.deleteRange(spark, base, 100L, 300L)
    val parts = readT(s"$tp/dfparts")
    assert(parts.filter(col("dfp") < 0).count() > 0,
      "the delete must have appended negative partials")
    val nets = parts.groupBy(col("tok")).agg(sum(col("dfp")).as("df"))
    assert(nets.filter(col("df") < 0).isEmpty,
      "no term's partials may net below zero")
    // Surviving-postings df must equal the netted partials, term for term.
    val fromPostings = readT(s"$tp/postings")
      .groupBy(col("tok")).agg(count(lit(1)).as("pdf"))
    assert(nets.filter(col("df") > 0)
      .join(fromPostings, Seq("tok"), "full_outer")
      .filter(coalesce(col("df"), lit(0L)) =!= coalesce(col("pdf"), lit(0L)))
      .isEmpty, "netted partials must equal survivor document frequency")
  }

  test("purge folds the vectors copy-on-write: serve hash-unchanged, masks gone") {
    val dir = freshDir()
    val base = maintainedBase(dir)
    val ct = IndexMaintenance.corpusTable(base)
    val tp = IndexMaintenance.textPath(base)
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) > 0)
    val servedMasked = TextIndex.serve(spark, tp, Seq("dup", "spark", "window"))
      .collect().toSeq
    def dataBytes(p: String): Long = {
      val d = new java.io.File(p, "data")
      if (!d.isDirectory) 0L else d.listFiles().map(_.length).sum
    }
    val preBytes = dataBytes(ct)
    assert(IndexMaintenance.purgeDeletes(spark, base) > 0,
      "the purge must rewrite at least one DV-touched file")
    // Content preserved exactly; fence re-advanced; bytes reclaimed.
    assert(TextIndex.serve(spark, tp, Seq("dup", "spark", "window"))
      .collect().toSeq === servedMasked)
    assert(IndexFence.staleness(tp).contains(false))
    assert(dataBytes(ct) < preBytes,
      "vacuum after the purge must reclaim the originals' bytes")
    assert(readT(ct).filter(col("doc_id") >= 100 && col("doc_id") < 300).isEmpty)
    // Idempotent: nothing left to fold.
    assert(IndexMaintenance.purgeDeletes(spark, base) === 0)
    // And a replayed delete window still no-ops (victims physically gone).
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) === 0L)
  }

  test("vector purge: serve hash-unchanged, fence fresh, idempotent") {
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir, tmpBase("vecp"))
    val embAll = spark.read.parquet(s"$dir/embeddings.parquet")
    VectorMaintenance.ingestAppend(spark, base,
      embAll.filter(col("vec_id") % 13 === 6))
    assert(VectorMaintenance.deleteRange(spark, base, 100L, 300L) > 0)
    val ip = VectorMaintenance.vecPath(base)
    val servedMasked = VectorIndex.serve(spark, ip, 1).collect().toSeq
    assert(VectorMaintenance.purgeDeletes(spark, base) > 0)
    assert(VectorIndex.serve(spark, ip, 1).collect().toSeq === servedMasked)
    assert(IndexFence.staleness(ip).contains(false))
    assert(VectorMaintenance.purgeDeletes(spark, base) === 0)
  }

  test("vector delete: serve ≡ frozen-centroid assignment over survivors") {
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir, tmpBase("vec"))
    val embAll = spark.read.parquet(s"$dir/embeddings.parquet")
    VectorMaintenance.ingestAppend(spark, base,
      embAll.filter(col("vec_id") % 13 === 6))
    val n = VectorMaintenance.deleteRange(spark, base, 100L, 300L)
    assert(n > 0)
    val ip = VectorMaintenance.vecPath(base)
    assert(IndexFence.staleness(ip).contains(false))
    assert(readT(s"$ip/assigned")
      .filter(col("vec_id") >= 100 && col("vec_id") < 300).isEmpty)
    val served = VectorIndex.serve(spark, ip, 1).collect().toSeq
    // Reference: centroids over the ORIGINAL base universe (%13 ≠ 6 —
    // training saw the victims), assignment over survivors only.
    val embBase = Similarity.normalizedDf(embAll.filter(col("vec_id") % 13 =!= 6))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = Similarity.kmeansCentroids(embBase)
    val assigned = Similarity.kmeansAssign(Similarity.normalizedDf(embAll), cents)
      .filter(!(col("vec_id") >= 100 && col("vec_id") < 300))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = broadcast(assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"), col("cell")))
    val want = Similarity.ivfSearch(probes, assigned).collect().toSeq
    assert(served === want)
    // Replay no-ops.
    assert(VectorMaintenance.deleteRange(spark, base, 100L, 300L) === 0L)
  }
}
