package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.functions._

/** The incremental-maintenance contract (verdict-r14 #3): one WAP-staged
  * decision appends a batch to the managed corpus AND all its index rows;
  * served results equal a full rebuild hash-strictly; the fence accepts
  * maintained drift and still refuses out-of-band drift; a failed audit
  * discards the whole stage. */
class IndexAppendSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def fmt = classOf[ManifestFileSink].getName

  /** A private copy of the corpus so this spec's bases never collide
    * with entry runs over the shared testdata dir. */
  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-append-dir").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("maintained serve equals full rebuild, hash-strict, both indexes") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBase(spark, dir)
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    // Full rebuilds over the SAME final universe (%13 != 5) at fresh paths.
    val finalCorpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 =!= 5)
    val tFull = Files.createTempDirectory("graft-append-tfull").toString
    TextIndex.buildFrom(spark, finalCorpus, s"$dir/documents.parquet", tFull)
    val dFull = Files.createTempDirectory("graft-append-dfull").toString
    DedupIndex.buildFrom(spark, finalCorpus, s"$dir/documents.parquet", dFull)
    val terms = Seq("dup", "spark", "window")
    assert(TextIndex.serve(spark, IndexMaintenance.textPath(base), terms)
      .collect().toSeq ===
      TextIndex.serve(spark, tFull, terms).collect().toSeq)
    assert(TextIndex.serveHybrid(spark, IndexMaintenance.textPath(base), terms)
      .collect().toSeq ===
      TextIndex.serveHybrid(spark, tFull, terms).collect().toSeq,
      "hybrid serve must also match: norms re-materialized in the transaction")
    val probe = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 === 5)
    assert(DedupIndex.serve(spark, IndexMaintenance.dedupPath(base), probe)
      .collect().toSeq ===
      DedupIndex.serve(spark, dFull, probe).collect().toSeq)
  }

  test("fence accepts maintained drift; still refuses out-of-band drift") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBase(spark, dir)
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(false))
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    // Maintained drift: the corpus table advanced AND the fences moved
    // with it — fresh, not stale.
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(false))
    assert(DedupIndex.staleness(IndexMaintenance.dedupPath(base)).contains(false))
    // Out-of-band drift: a direct append to the corpus table, no
    // transaction. Every serve (and further maintenance) must refuse.
    import spark.implicits._
    Seq((888888888L, "rogue out of band text", "en", "src0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base))
      .mode("append").save()
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(true))
    assert(DedupIndex.staleness(IndexMaintenance.dedupPath(base)).contains(true))
    val e1 = intercept[IllegalStateException](
      TextIndex.serve(spark, IndexMaintenance.textPath(base), Seq("dup")))
    assert(e1.getMessage.contains("STALE"))
    val e2 = intercept[IllegalStateException](
      IndexMaintenance.ingestAppend(spark, base,
        Seq((999999999L, "late batch", "en", "src0", 10L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")))
    assert(e2.getMessage.contains("out-of-band"))
  }

  test("failed audit discards the entire stage: no table grows, no stage remains") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBase(spark, dir)
    def count(p: String): Long =
      spark.read.format(fmt).option("path", p).load().count()
    val tables = Seq(
      IndexMaintenance.corpusTable(base),
      s"${IndexMaintenance.textPath(base)}/postings",
      s"${IndexMaintenance.textPath(base)}/stats",
      s"${IndexMaintenance.dedupPath(base)}/bands",
      s"${IndexMaintenance.dedupPath(base)}/shingles")
    val pre = tables.map(p => p -> count(p)).toMap
    // A batch that REPLAYS an existing corpus doc violates the append
    // contract (new-ids audit) — the whole five-table stage must discard.
    val existing = spark.read.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base)).load()
      .orderBy(col("doc_id")).limit(1)
    val e = intercept[IllegalStateException](
      IndexMaintenance.ingestAppend(spark, base, existing))
    assert(e.getMessage.contains("already in the corpus"))
    tables.foreach { p =>
      assert(count(p) === pre(p), s"$p must not grow on a failed audit")
      assert(ManifestFileSink.latestManifest(p).isDefined)
    }
    // And the index is still fresh + servable after the refusal.
    assert(TextIndex.staleness(IndexMaintenance.textPath(base)).contains(false))
    assert(TextIndex.serve(spark, IndexMaintenance.textPath(base),
      Seq("dup")).count() > 0)
  }

  test("refused ingest → serve succeeds WITHOUT a rebuild (file set unchanged)") {
    // Verdict-r15 #3's stronger contract: the stage+discard must leave
    // the fence fingerprint EXACTLY restored (the published manifest
    // chain is the logical state; directory mtimes are not), so the
    // recovery path after a refusal is "serve as before" — never the
    // full rebuild the maintenance path exists to avoid. Proven by file
    // identity: every index artifact file (name, length) is untouched
    // through refusal → ensureBase → serve.
    val dir = freshDir()
    val base = IndexMaintenance.ensureBase(spark, dir)
    def listing(p: String): Set[(String, Long)] = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.isFile).map(f => (f.getName, f.length)).toSet ++
        // Seq-claim markers (`_commits/`) are excluded: a refused stage
        // legitimately leaves its claimed seq behind as a permanent gap
        // — claims are allocation bookkeeping, not logical table state.
        d.listFiles().filter(d2 => d2.isDirectory && d2.getName != "_commits")
          .flatMap(s => s.listFiles().filter(_.isFile)
            .map(f => (s.getName + "/" + f.getName, f.length)))
    }
    val tp = IndexMaintenance.textPath(base)
    val dp = IndexMaintenance.dedupPath(base)
    val pre = listing(s"$tp/postings") ++ listing(s"$tp/norms") ++
      listing(s"$dp/bands")
    val existing = spark.read.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base)).load()
      .orderBy(col("doc_id")).limit(1)
    intercept[IllegalStateException](
      IndexMaintenance.ingestAppend(spark, base, existing))
    // ensureBase would rebuild on a stale fence — it must no-op here.
    IndexMaintenance.ensureBase(spark, dir)
    assert(TextIndex.serve(spark, tp, Seq("dup")).count() > 0)
    assert(DedupIndex.serve(spark, dp,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 5)).collect() != null)
    val post = listing(s"$tp/postings") ++ listing(s"$tp/norms") ++
      listing(s"$dp/bands")
    assert(post === pre,
      "a refused ingest must not trigger any index rebuild or rewrite")
  }

  test("compaction folds append segments; serve hash-unchanged, one file per probed bucket") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = freshDir()
      val base = IndexMaintenance.ensureBase(spark, dir)
      IndexMaintenance.ingestAppend(spark, base,
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 13 === 6))
      val tp = IndexMaintenance.textPath(base)
      val postingsT = s"$tp/postings"
      val terms = Seq("dup", "spark", "window")
      val pre = TextIndex.serve(spark, tp, terms).collect().toSeq
      assert(ManifestFileSink.publishedManifestCount(postingsT) > 1,
        "append must have left a second segment to fold")
      ManifestFileSink.repartitionTable(spark, postingsT, Seq("tb"), 64)
      spark.catalog.refreshByPath(postingsT)
      assert(ManifestFileSink.publishedManifestCount(postingsT) === 1,
        "compaction publishes ONE superseding manifest")
      // Fence untouched: the corpus never moved, only index files did.
      assert(TextIndex.staleness(tp).contains(false))
      val served = TextIndex.serve(spark, tp, terms)
      assert(served.collect().toSeq === pre,
        "compaction must not change a single served row")
      val scans = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
        .filter(_.scan.description.contains("In(tb"))
      assert(scans.nonEmpty)
      val read = scans.map(_.metrics("filesRead").value).max
      assert(read <= terms.size,
        s"after compaction each probed bucket is ONE file (read=$read)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("serve after maintenance still opens only probed buckets (filesRead pin)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = freshDir()
      val base = IndexMaintenance.ensureBase(spark, dir)
      IndexMaintenance.ingestAppend(spark, base,
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 13 === 6))
      val served = TextIndex.serve(spark, IndexMaintenance.textPath(base),
        Seq("dup", "spark", "window"))
      served.collect()
      val scans = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
      val postingScans = scans.filter(_.scan.description.contains("In(tb"))
      assert(postingScans.nonEmpty, "expected the probed-bucket IN filter")
      val all = spark.read.format(fmt)
        .option("path", s"${IndexMaintenance.textPath(base)}/postings").load()
        .select(col("tb")).distinct().count()
      val read = postingScans.map(_.metrics("filesRead").value).max
      val pruned = postingScans.map(_.metrics("filesPruned").value).max
      // The maintained table holds TWO segments (build + append), so the
      // probed buckets may own up to two files each — still pruned to
      // far fewer than the table's full file set.
      assert(read + pruned > 0 && read < read + pruned,
        s"maintained serve must prune: read=$read pruned=$pruned of $all buckets")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("dedup compaction folds both tables; probe hash-unchanged, fences fresh") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBase(spark, dir)
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    val dp = IndexMaintenance.dedupPath(base)
    val probe = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 13 === 5)
    val pre = DedupIndex.serve(spark, dp, probe).collect().toSeq
    for ((t, c) <- Seq(s"$dp/bands" -> "bb", s"$dp/shingles" -> "db")) {
      assert(ManifestFileSink.publishedManifestCount(t) > 1,
        s"$t: append must have left a second segment to fold")
      ManifestFileSink.repartitionTable(spark, t, Seq(c), 32)
      spark.catalog.refreshByPath(t)
      assert(ManifestFileSink.publishedManifestCount(t) === 1,
        s"$t: compaction publishes ONE superseding manifest")
    }
    assert(DedupIndex.staleness(dp).contains(false),
      "the corpus never moved — compaction must not touch the fence")
    assert(DedupIndex.serve(spark, dp, probe).collect().toSeq === pre,
      "compaction must not change a single probed pair")
  }

  test("vacuum reclaims exactly the unreferenced post-compaction files; serve unchanged") {
    val dir = freshDir()
    val base = IndexMaintenance.ensureBase(spark, dir)
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    val tp = IndexMaintenance.textPath(base)
    val postingsT = s"$tp/postings"
    val terms = Seq("dup", "spark", "window")
    val pre = TextIndex.serve(spark, tp, terms).collect().toSeq
    ManifestFileSink.repartitionTable(spark, postingsT, Seq("tb"), 64)
    spark.catalog.refreshByPath(postingsT)
    def dataFiles(): Set[String] = {
      val d = new java.io.File(postingsT, "data")
      d.listFiles().filter(_.isFile).map(_.getName).toSet
    }
    // Post-compaction live set = ONE file per populated term bucket
    // (the compaction case pins this); everything beyond it on disk is
    // a superseded original awaiting vacuum.
    val liveBuckets = spark.read.format(fmt).option("path", postingsT).load()
      .select(col("tb")).distinct().count()
    val before = dataFiles()
    assert(before.size > liveBuckets,
      "compaction must leave its superseded originals on disk for vacuum")
    val removed = ManifestFileSink.vacuum(postingsT, olderThanMs = 0L)
    assert(removed > 0, "vacuum must reclaim the superseded files")
    val after = dataFiles()
    assert(after.size === before.size - removed)
    assert(after.size === liveBuckets,
      "after vacuum the data dir holds exactly the one-per-bucket live files")
    assert(after.subsetOf(before))
    assert(TextIndex.serve(spark, tp, terms).collect().toSeq === pre,
      "vacuum must not change a single served row")
    assert(ManifestFileSink.vacuum(postingsT, olderThanMs = 0L) === 0,
      "a second vacuum finds nothing to reclaim")
  }
}
