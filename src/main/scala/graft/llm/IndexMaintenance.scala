package graft.llm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ManifestFileSink, Tables}

/** INCREMENTAL maintenance for the persisted indexes — the production
  * gap verdict-r14 #3 names: `text_curation_ingest` gates an arriving
  * batch against the dedup index, but short of a full rebuild nothing
  * UPDATED an index afterwards — every fence refused drift and rebuilt
  * in place, and at 100 TB an append-heavy corpus cannot re-derive
  * postings/bands per batch.
  *
  * The composition (all machinery that already exists, now arranged as
  * the Iceberg-style ingest transaction):
  *
  *   - a MANAGED corpus table (manifest format) is the source of truth
  *     the indexes fence on — not the raw input files;
  *   - [[ingestAppend]] stages, under ONE `wap-id`, the batch's corpus
  *     rows AND its text-index posting rows AND its per-segment stats
  *     row AND its dedup band + shingle rows — five appends, one
  *     decision;
  *   - the AUDIT reads the staged state through `VERSION AS OF
  *     'wap:<id>'` and checks the append contract: batch doc ids are
  *     NEW (disjoint from the standing corpus — the property the
  *     serve-side df fold and the band probe both rely on) and each
  *     staged table grew by exactly the batch's computed row count;
  *   - publish cherry-picks all five stages onto their main lines
  *     (append-only, so publication commutes with anything that landed
  *     in between; [[ManifestFileSink.wapPublish]] is idempotent across
  *     crash windows via the folded ledger); a failed audit discards
  *     all five and nothing of the batch survives;
  *   - the text index's per-doc tf-idf NORMS are then re-materialized
  *     from the PERSISTED postings table (every norm shifts when
  *     n_docs or a shared term's df moves — but the recompute is
  *     index-grain: the corpus text is never re-tokenized);
  *   - LAST, both [[IndexFence]]s advance to the corpus table's new
  *     fingerprint: drift that went through this path is ACCEPTED,
  *     while out-of-band drift (anything that touched the corpus
  *     without the maintenance transaction) still mismatches and
  *     serve still refuses. A crash anywhere in the window leaves the
  *     fence behind the corpus, which reads as stale — the failure
  *     mode is a refusal plus one rebuild, never a wrong answer.
  *
  * Serve-side exactness after appends (why the served results are
  * hash-identical to a full rebuild):
  *   - dedup: band and shingle rows are PER-DOC — no global statistic
  *     exists to stale, so append-then-probe ≡ rebuild-then-probe;
  *   - text BM25: posting rows are per-(doc, term); df is derived from
  *     the probed rows at serve ([[TextIndex]]'s segment-append
  *     design) and n_docs/sum_dl fold over the per-segment stats rows,
  *     so every global statistic is exact after any number of appends;
  *   - hybrid: norms re-materialize inside the transaction (above).
  *
  * At 100 TB: the per-batch cost is tokenize/shingle THE BATCH, five
  * bounded appends, and the norms re-materialization — the one
  * index-grain term, amortized by batching maintenance epochs (the
  * norms table is one slim row per doc; rebuilding it reads the
  * postings table, ~1% of corpus bytes, not the corpus). Everything
  * else is O(batch).
  *
  * Entry split: the managed corpus starts as `doc_id % 13 ∉ {5, 6}`,
  * the maintained append is class 6, and class 5 stays the probe batch
  * — so after maintenance the corpus is exactly `% 13 ≠ 5` and both
  * entries replay against DuckDB oracles over the one documents table
  * (class 6 docs appear as `d1` in the served dedup pairs at every
  * test SF, so a silently-skipped band append is a hash miss, not a
  * silent pass).
  */
object IndexMaintenance {

  private def fmt = classOf[ManifestFileSink].getName

  private val AppendClass = 6
  private[graft] val ProbeClass = 5
  private val WapId = "ingest-c6"

  def basePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_ingest", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  def corpusTable(base: String): String = s"$base/corpus"
  def textPath(base: String): String = s"$base/text"
  def dedupPath(base: String): String = s"$base/dedup"

  private def readCorpus(s: SparkSession, base: String): DataFrame =
    s.read.format(fmt).option("path", corpusTable(base)).load()

  /** Build the managed corpus + both indexes when absent or when a
    * fence reads stale (out-of-band drift self-heals here by rebuild —
    * the same recovery every standalone index uses; only the direct
    * serve path REFUSES). Idempotent: fresh fences no-op. */
  def ensureBase(s: SparkSession, dir: String): String =
    ensureBaseAt(s, dir, basePath(dir))

  /** [[ensureBase]] at an explicit base — the streaming ingest keeps
    * its OWN managed corpus ([[graft.streaming.StreamingIngest]]) so
    * the batch and stream entries can't race each other's fences. */
  def ensureBaseAt(s: SparkSession, dir: String, base: String): String = synchronized {
    val ct = corpusTable(base)
    val corpusExists = Files.isDirectory(Paths.get(ct)) && {
      val l = Files.list(Paths.get(ct))
      try l.iterator().hasNext finally l.close()
    }
    if (!corpusExists) {
      IndexFence.rmTree(Paths.get(base))
      Files.createDirectories(Paths.get(ct))
      Tables(s, dir).documents
        .filter(col("doc_id") % 13 =!= ProbeClass &&
          col("doc_id") % 13 =!= AppendClass)
        .write.format(fmt).option("path", ct).mode("append").save()
    }
    s.catalog.refreshByPath(ct)
    // A torn maintenance crash must not cost a rebuild: finish any
    // mid-publish transaction (norms + fences re-derived inside) before
    // the builds below judge freshness.
    recoverTorn(s, base)
    // Index (re)builds read the MANAGED table — the production lineage:
    // buildFrom no-ops on a fresh fence, rebuilds on drift/pre-fence.
    TextIndex.buildFrom(s, readCorpus(s, base), ct, textPath(base))
    DedupIndex.buildFrom(s, readCorpus(s, base), ct, dedupPath(base))
    base
  }

  /** Finish any transaction on this base that died MID-PUBLISH (see
    * [[ManifestFileSink.wapRollForward]]: stage order == publish order,
    * corpus table first, so a wap id staged on a later table but
    * consumed on the corpus is exact evidence the publish loop started
    * and crashed), then re-derive the post-publish state the crash
    * lost: the norms refold and both fences. Unlike the vector index
    * there is NO content-based fence reconcile here — postings/shingles
    * legitimately omit short or empty documents, so corpus-vs-index id
    * equality is not a sound audit; a crash between the LAST publish
    * and the fence write still reads as stale and rebuilds (safe,
    * never wrong — and the window is one file write wide). */
  private def recoverTorn(s: SparkSession, base: String): Seq[String] = {
    val ct = corpusTable(base)
    val tp = textPath(base)
    val dp = dedupPath(base)
    val postingsT = s"$tp/postings"
    val tables = Seq(ct, postingsT, s"$tp/stats", s"$tp/dfparts",
      s"$tp/passages", s"$tp/pstats", s"$tp/pdfparts",
      s"$dp/bands", s"$dp/shingles", ledgerTable(base), delsTable(base))
    val torn = ManifestFileSink.wapRollForward(tables)
    if (torn.nonEmpty) {
      tables.foreach(s.catalog.refreshByPath)
      // The norms refold reads the v3+ dfparts/stats tables: a PRE-v4
      // base surviving on a persistent /tmp that also carries a torn
      // staged suffix has no dfparts to read (advice-r17 low) — skip
      // the refold AND the fence advance, so the base falls through to
      // [[TextIndex.buildFrom]]'s layout-version clean rebuild instead
      // of crashing inside recovery.
      if (IndexFence.readLayout(tp) == TextIndex.LayoutVersion)
        TextIndex.writeNorms(s,
          s.read.format(fmt).option("path", postingsT).load(), tp)
      else return torn
      s.catalog.refreshByPath(ct)
      val fp = IndexFence.fingerprint(ct)
      IndexFence.write(tp, ct, fp)
      IndexFence.write(dp, ct, fp)
    }
    torn
  }

  /** Has the standard append batch already been ingested? One bounded
    * probe (first matching row, not a count) — at scale this is the
    * ingest ledger's job; here the corpus itself answers. */
  def batchApplied(s: SparkSession, base: String): Boolean =
    !readCorpus(s, base)
      .filter(col("doc_id") % 13 === AppendClass)
      .limit(1).isEmpty

  /** Retraction ledger — one row per applied delete (`del_lo, del_hi,
    * n_docs`), staged and published INSIDE the delete's own transaction
    * exactly like the curated epochs' decision ledger. */
  def delsTable(base: String): String = s"$base/dels"

  /** The DELETE maintenance verb (verdict-r16 Next #2 — the missing
    * verb): retract every document in `[lo, hi)` from the corpus AND
    * all five index tables in ONE WAP-staged multi-table commit, so a
    * production takedown (licensing, GDPR, a bad crawl window) costs a
    * bounded retraction instead of the full rebuild the fence used to
    * force. The range form is the scale-honest shape: deletion vectors
    * resolve it with pure zone-map pruning (a file whose doc_id min/max
    * refutes the range is never opened) and no victim-id list rides the
    * driver; an id-addressed takedown list is ranges of width one.
    *
    * Transaction (stage order == publish order, corpus first — the
    * [[recoverTorn]] roll-forward covers every mid-publish crash):
    *
    *   1. staged deletion vectors on corpus, postings, bands, shingles
    *      (all four carry `doc_id`, so the ONE range predicate serves
    *      every table — [[ManifestFileSink.deleteWhereStaged]]);
    *   2. a NEGATIVE per-segment stats row (−n_docs, −sum_dl) and
    *      NEGATIVE df partials (tok, tb, −dfp), both computed from the
    *      victims' still-visible posting rows — the sum-folds that make
    *      serve's global statistics exact under appends absorb
    *      retractions by the same argument;
    *   3. the retraction-ledger row;
    *   4. AUDIT via the `wap:` views: every table's staged delta equals
    *      the victim grain computed from the pre-delete main line —
    *      then publish all seven, or discard all seven;
    *   5. norms refold from the surviving postings (same index-grain
    *      recompute as the append path) and both fences advance:
    *      a delete through this path is maintained drift; out-of-band
    *      deletes still read as stale and refuse.
    *
    * Idempotent: a replayed range finds no victims (deletion vectors
    * already mask them) and no-ops. Serve-side exactness: probed
    * postings are survivors (merge-on-read masks victims), df = sum of
    * partials (positive + negative) = survivor document frequency,
    * stats fold = survivor counts — so maintained-serve ≡
    * rebuild-over-survivors row for row (IndexDeleteSpec pins it).
    *
    * Returns the number of corpus documents retracted (0 = replay). */
  def deleteRange(s: SparkSession, base: String, lo: Long, hi: Long): Long =
    deleteRanges(s, base, Seq((lo, hi))).head

  /** The BATCHED delete verb (verdict-r17 Next #2): retract K disjoint
    * windows in ONE ten-table WAP transaction — K orders in one
    * takedown micro-batch used to pay K transactions and K norms
    * refolds where one of each suffices (disjoint windows commute, so
    * their union is one victim set). The union predicate is an OR of
    * range filters, which the zone maps prune file-by-file exactly as
    * the single window's AND does; the negative stats/df-partial rows
    * fold over the union victims; the retraction ledger still records
    * ONE ROW PER WINDOW (each order stays individually auditable), all
    * staged and published under one wap id with one refold and one
    * fence advance.
    *
    * `windows` must be strictly ascending and pairwise disjoint (the
    * commutation argument — an overlap would double-count the shared
    * victims in the per-window ledger rows). A window with no victims
    * is a per-window replay: it contributes no ledger row and returns
    * 0; only if EVERY window is a replay does the whole call no-op.
    * Returns per-window retracted counts, aligned with `windows`. */
  def deleteRanges(s: SparkSession, base: String,
      windows: Seq[(Long, Long)]): Seq[Long] =
    MaintenanceLease.withLease(base, "deleteRanges")(
      deleteRangesImpl(s, base, windows))

  private def deleteRangesImpl(s: SparkSession, base: String,
      windows: Seq[(Long, Long)]): Seq[Long] =
    synchronized {
      require(windows.nonEmpty, "no delete windows")
      windows.foreach { case (lo, hi) =>
        require(lo < hi, s"empty delete range [$lo, $hi)") }
      windows.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => require(h1 <= l2,
          s"delete windows must be sorted and disjoint (got …$h1) ∩ [$l2…)")
        case _ =>
      }
      // One window keeps the pre-batch wap id (replay compatibility
      // with r17 ledgers); a batch derives its id from every window.
      val wapId =
        if (windows.size == 1) s"delete-${windows.head._1}-${windows.head._2}"
        else "delete-batch-" + windows.map { case (l, h) => s"$l-$h" }.mkString("_")
      val ct = corpusTable(base)
      val tp = textPath(base)
      val dp = dedupPath(base)
      recoverTorn(s, base)
      for (p <- Seq(tp, dp); st <- IndexFence.staleness(p))
        if (st) throw new IllegalStateException(
          s"index at $p is STALE (out-of-band corpus drift): rebuild " +
            "before maintaining.")
      val postingsT = s"$tp/postings"
      val statsT = s"$tp/stats"
      val dfPartsT = s"$tp/dfparts"
      val passagesT = s"$tp/passages"
      val pstatsT = s"$tp/pstats"
      val pdfPartsT = s"$tp/pdfparts"
      val bandsT = s"$dp/bands"
      val shinglesT = s"$dp/shingles"
      val dt = delsTable(base)
      val allTables = Seq(ct, postingsT, statsT, dfPartsT,
        passagesT, pstatsT, pdfPartsT, bandsT, shinglesT, dt)
      // Clear any torn stage of THIS delete (reverse-order / roll-
      // forward aware — see [[ManifestFileSink.wapAbort]]).
      ManifestFileSink.wapAbort(allTables, wapId)
      val pred = windows.map { case (lo, hi) =>
        col("doc_id") >= lo && col("doc_id") < hi }.reduce(_ || _)
      val filt = windows.map { case (lo, hi) =>
        org.apache.spark.sql.sources.And(
          org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", lo),
          org.apache.spark.sql.sources.LessThan("doc_id", hi))
          : org.apache.spark.sql.sources.Filter
      }.reduce(org.apache.spark.sql.sources.Or(_, _))
      def read(p: String): DataFrame =
        s.read.format(fmt).option("path", p).load()
      // Victim grain from the PRE-delete main line (the staged vectors
      // are invisible until publish, so these reads see the victims).
      // Per-window counts in ONE pruned pass: the window label is a
      // when-chain over K range tests — K is the order list, metadata-
      // grain by nature, never the data.
      val winCol = windows.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, ((lo, hi), i)) =>
          when(col("doc_id") >= lo && col("doc_id") < hi, lit(i)).otherwise(acc)
      }
      val perWin = readCorpus(s, base).filter(pred)
        .groupBy(winCol.as("w")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val counts = windows.indices.map(i => perWin.getOrElse(i, 0L))
      val nDocs = counts.sum
      if (nDocs == 0) return counts // replay or empty windows: no-op
      val vPost = read(postingsT).filter(pred)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPost = vPost.count()
      val vPass = read(passagesT).filter(pred)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPass = vPass.count()
      val nBands = read(bandsT).filter(pred).count()
      val nSh = read(shinglesT).filter(pred).count()
      val negStats = TextIndex.statsRow(vPost)
        .select((-col("n_docs")).as("n_docs"), (-col("sum_dl")).as("sum_dl"))
      val negParts = TextIndex.dfPartRows(vPost)
        .select(col("tok"), col("tb"), (-col("dfp")).as("dfp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nParts = negParts.count()
      val negPstats = TextIndex.pstatsRow(vPass)
        .select((-col("n_chunks")).as("n_chunks"), (-col("sum_dl")).as("sum_dl"))
      val negPParts = TextIndex.pdfPartRows(vPass)
        .select(col("tok"), col("tb"), (-col("dfp")).as("dfp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPParts = negPParts.count()
      import s.implicits._
      // One ledger row per window WITH victims: a per-window replay
      // inside a batch stays a no-op row-wise, same as standalone.
      val applied = windows.zip(counts).filter(_._2 > 0)
      val delRow = applied.map { case ((lo, hi), n) => (lo, hi, n) }
        .toDF("del_lo", "del_hi", "n_docs")
      def stage(df: DataFrame, path: String): Unit =
        df.write.format(fmt).option("path", path).option("wap-id", wapId)
          .mode("append").save()
      def wapCount(path: String): Long =
        s.read.format(fmt).option("path", path)
          .option("asOfManifest", s"wap:$wapId").load().count()
      def mainCount(path: String): Long = read(path).count()
      try {
        val pre = allTables.map(p => p -> mainCount(p)).toMap
        val dCorpus = ManifestFileSink.deleteWhereStaged(ct, filt, wapId)
        val dPost = ManifestFileSink.deleteWhereStaged(postingsT, filt, wapId)
        stage(negStats, statsT)
        stage(negParts, dfPartsT)
        val dPass = ManifestFileSink.deleteWhereStaged(passagesT, filt, wapId)
        stage(negPstats, pstatsT)
        stage(negPParts, pdfPartsT)
        val dBands = ManifestFileSink.deleteWhereStaged(bandsT, filt, wapId)
        val dSh = ManifestFileSink.deleteWhereStaged(shinglesT, filt, wapId)
        stage(delRow, dt)
        // AUDIT: the staged retraction is exactly the victim grain.
        val expected = Map(
          ct -> -nDocs, postingsT -> -nPost, statsT -> 1L,
          dfPartsT -> nParts, passagesT -> -nPass, pstatsT -> 1L,
          pdfPartsT -> nPParts, bandsT -> -nBands, shinglesT -> -nSh,
          dt -> applied.size.toLong)
        val staged = Map(ct -> dCorpus, postingsT -> dPost,
          passagesT -> dPass, bandsT -> dBands, shinglesT -> dSh)
        for ((p, d) <- staged)
          if (d != -expected(p)) throw new IllegalStateException(
            s"delete audit failed: $p staged $d deletions, expected " +
              s"${-expected(p)}")
        for (p <- allTables) {
          val delta = wapCount(p) - pre(p)
          if (delta != expected(p)) throw new IllegalStateException(
            s"delete audit failed: $p staged delta $delta, expected " +
              s"${expected(p)}")
        }
        allTables.foreach(p => ManifestFileSink.wapPublish(p, wapId))
      } catch {
        case e: Throwable =>
          ManifestFileSink.wapAbort(allTables, wapId)
          throw e
      } finally {
        vPost.unpersist(); negParts.unpersist()
        vPass.unpersist(); negPParts.unpersist()
      }
      allTables.foreach(s.catalog.refreshByPath)
      TextIndex.writeNorms(s, read(postingsT), tp)
      s.catalog.refreshByPath(ct)
      val fp = IndexFence.fingerprint(ct)
      IndexFence.write(tp, ct, fp)
      IndexFence.write(dp, ct, fp)
      counts
    }

  /** The ingest transaction: stage batch rows into all five tables
    * under one WAP id, audit the staged state, publish or discard as
    * one decision, re-materialize norms, advance both fences. `wapId`
    * defaults to the batch entry's fixed id; the streaming path passes
    * a PER-EPOCH id (`ingest-e<epoch>`) so a replayed epoch's leftover
    * stage is distinguishable from a concurrent one. */
  def ingestAppend(s: SparkSession, base: String, batch: DataFrame,
      wapId: String = WapId): Unit =
    MaintenanceLease.withLease(base, "ingestAppend")(
      ingestAppendImpl(s, base, batch, wapId))

  private def ingestAppendImpl(s: SparkSession, base: String, batch: DataFrame,
      wapId: String): Unit =
    synchronized {
      val ct = corpusTable(base)
      val tp = textPath(base)
      val dp = dedupPath(base)
      recoverTorn(s, base)
      // Out-of-band drift refuses here too: maintenance may only extend
      // a fence-fresh index.
      for (p <- Seq(tp, dp); st <- IndexFence.staleness(p))
        if (st) throw new IllegalStateException(
          s"index at $p is STALE (out-of-band corpus drift): rebuild " +
            "before maintaining.")
      val postingsT = s"$tp/postings"
      val statsT = s"$tp/stats"
      val dfPartsT = s"$tp/dfparts"
      val passagesT = s"$tp/passages"
      val pstatsT = s"$tp/pstats"
      val pdfPartsT = s"$tp/pdfparts"
      val bandsT = s"$dp/bands"
      val shinglesT = s"$dp/shingles"
      val allTables = Seq(ct, postingsT, statsT, dfPartsT,
        passagesT, pstatsT, pdfPartsT, bandsT, shinglesT)

      val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bPost = TextIndex.postingRows(b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bDfParts = TextIndex.dfPartRows(bPost)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bPass = TextIndex.passageRows(b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bSh = Dedup.shingleRows(b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bBands = DedupIndex.bandTableRows(bSh)
      val bShRows = DedupIndex.shingleTableRows(bSh)

      def stage(df: DataFrame, path: String): Unit =
        df.write.format(fmt).option("path", path).option("wap-id", wapId)
          .mode("append").save()
      def wapView(path: String): DataFrame =
        s.read.format(fmt).option("path", path)
          .option("asOfManifest", s"wap:$wapId").load()
      def mainCount(path: String): Long =
        s.read.format(fmt).option("path", path).load().count()

      try {
        val pre = allTables.map(p => p -> mainCount(p)).toMap
        stage(b, ct)
        stage(bPost, postingsT)
        stage(TextIndex.statsRow(bPost), statsT)
        stage(bDfParts, dfPartsT)
        stage(bPass, passagesT)
        stage(TextIndex.pstatsRow(bPass), pstatsT)
        stage(TextIndex.pdfPartRows(bPass), pdfPartsT)
        stage(bBands, bandsT)
        stage(bShRows, shinglesT)
        // ---- AUDIT (reads the staged state via VERSION AS OF 'wap:').
        // 1. The append contract: batch doc ids are NEW. The serve-side
        //    df fold counts rows per (term) assuming (doc, term)
        //    uniqueness across segments; a replayed doc would silently
        //    double df. Batch-bounded probe: semi-join of the standing
        //    corpus against the batch's ids.
        val collisions = readCorpus(s, base).join(
          b.select(col("doc_id")), Seq("doc_id"), "left_semi").count()
        if (collisions > 0) throw new IllegalStateException(
          s"ingest audit failed: $collisions batch doc_ids already in " +
            "the corpus — appends must be new documents")
        // 2. Each staged table grew by exactly its computed batch rows.
        val expected = Map(
          ct -> b.count(), postingsT -> bPost.count(),
          statsT -> 1L, dfPartsT -> bDfParts.count(),
          passagesT -> bPass.count(), pstatsT -> 1L,
          pdfPartsT -> TextIndex.pdfPartRows(bPass).count(),
          bandsT -> bBands.count(), shinglesT -> bShRows.count())
        for (p <- allTables) {
          val grew = wapView(p).count() - pre(p)
          if (grew != expected(p)) throw new IllegalStateException(
            s"ingest audit failed: $p staged ${grew} rows, expected " +
              s"${expected(p)}")
        }
        // ---- PUBLISH: all five stages onto their main lines.
        allTables.foreach(p => ManifestFileSink.wapPublish(p, wapId))
      } catch {
        case e: Throwable =>
          ManifestFileSink.wapAbort(allTables, wapId)
          b.unpersist(); bPost.unpersist(); bDfParts.unpersist()
          bPass.unpersist(); bSh.unpersist()
          throw e
      }
      // ---- Norms re-materialize from the PERSISTED postings (index-
      // grain; see object doc). Runs after publish so it sees the full
      // posting set; a crash before the fence writes below leaves the
      // fence behind → stale → refusal + rebuild, never a wrong answer.
      s.catalog.refreshByPath(postingsT)
      TextIndex.writeNorms(s,
        s.read.format(fmt).option("path", postingsT).load(), tp)
      // ---- Fences advance LAST: maintained drift is now accepted.
      s.catalog.refreshByPath(ct)
      val fp = IndexFence.fingerprint(ct)
      IndexFence.write(tp, ct, fp)
      IndexFence.write(dp, ct, fp)
      b.unpersist(); bPost.unpersist(); bDfParts.unpersist()
      bPass.unpersist(); bSh.unpersist()
    }

  /** One STREAMING epoch's ingest, exactly-once under replay — the
    * `foreachBatch` body [[graft.streaming.StreamingIngest]] installs
    * (verdict-r15 Next #4). Structured Streaming's recovery contract is
    * at-least-once delivery to the sink: after a mid-stream kill the
    * restarted query REPLAYS the last unacknowledged epoch, so the body
    * must make the five-table transaction idempotent per epoch:
    *
    *   1. a replayed epoch whose batch FULLY landed (crash after
    *      publish, before the checkpoint ack) detects itself — every
    *      batch doc id already in the corpus — and no-ops;
    *   2. a torn stage from a crashed attempt (staged manifests under
    *      this epoch's own `wap-id`, never published) is discarded
    *      before re-staging, so the retry starts clean — and with the
    *      manifest-chain fence fingerprint, that discard does not
    *      stale anything;
    *   3. a PARTIAL overlap (some ids present, some not) is neither —
    *      it means the batch boundary itself drifted across the
    *      restart, which no append-only recovery can reconcile:
    *      refuse loudly (the ingestAppend audit does).
    *
    * Returns true when the epoch applied, false when it replayed as a
    * no-op. */
  def applyEpoch(s: SparkSession, base: String, batch: DataFrame,
      epochId: Long): Boolean =
    MaintenanceLease.withLease(base, "applyEpoch")(
      applyEpochImpl(s, base, batch, epochId))

  private def applyEpochImpl(s: SparkSession, base: String, batch: DataFrame,
      epochId: Long): Boolean = synchronized {
    val wapId = s"ingest-e$epochId"
    // Primary torn-state recovery: a crash mid-publish leaves a staged
    // suffix — finish it (and its norms/fence re-derivation) BEFORE the
    // membership check below, so "fully landed in the corpus" implies
    // fully landed everywhere and the no-op is sound.
    val recovered = recoverTorn(s, base)
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ids = b.select(col("doc_id"))
      val total = ids.count()
      if (total == 0) return false
      val present = readCorpus(s, base)
        .join(ids, Seq("doc_id"), "left_semi").count()
      if (present == total)
        // Fully-applied replay: no-op — unless the roll-forward above is
        // what completed it, in which case this call DID apply the epoch.
        return recovered.contains(wapId)
      // (present in (0, total) falls through: the new-ids audit inside
      // ingestAppend refuses it with the collision count — case 3.)
      val allTables = Seq(corpusTable(base),
        s"${textPath(base)}/postings", s"${textPath(base)}/stats",
        s"${textPath(base)}/dfparts", s"${textPath(base)}/passages",
        s"${textPath(base)}/pstats", s"${textPath(base)}/pdfparts",
        s"${dedupPath(base)}/bands", s"${dedupPath(base)}/shingles")
      // case 2: clear any torn stage of THIS epoch (reverse-order /
      // roll-forward aware).
      ManifestFileSink.wapAbort(allTables, wapId)
      ingestAppend(s, base, b, wapId)
      true
    } finally b.unpersist()
  }

  // ------------------------------------------------ curated epochs

  /** Decision ledger for GATED epochs: unlike the plain append (where
    * "every batch id in the corpus" IS the applied-marker), a curated
    * epoch REJECTS documents — a replayed epoch whose admits all landed
    * is indistinguishable from an unprocessed epoch by corpus content
    * alone. One ledger row per decided epoch, staged and published
    * INSIDE the epoch's own transaction, makes the decision itself
    * atomic with its effects. */
  def ledgerTable(base: String): String = s"$base/ledger"

  def epochDecided(s: SparkSession, base: String, epochId: Long): Boolean = {
    val lt = ledgerTable(base)
    // A ledger dir holding ONLY a torn stage (crash before the first
    // publish) has no readable published snapshot — that reads as
    // "undecided", which is exactly right: the retry discards the torn
    // stage and re-runs the epoch.
    try {
      Files.isDirectory(Paths.get(lt)) && {
        val l = Files.list(Paths.get(lt))
        val nonEmpty = try l.iterator().hasNext finally l.close()
        nonEmpty && !s.read.format(fmt).option("path", lt).load()
          .filter(col("epoch") === epochId).limit(1).isEmpty
      }
    } catch { case _: Exception => false }
  }

  /** One CURATED streaming epoch — the full production admission gate
    * run per micro-batch, with the epoch decision atomic under one
    * `wap-id` (the [[graft.streaming.StreamingIngest]] delivery, the
    * [[Curation.curationIngest]] gate, this transaction):
    *
    *   1. near-dup REJECT against the standing corpus — a pruned probe
    *      of the persisted dedup index (exact Jaccard ≥ 0.8 verify);
    *   2. within-epoch keep-first dedup (d1 < d2 over the epoch's own
    *      shingles — computed over the FULL epoch, before quality, the
    *      [[Curation]] ordering);
    *   3. quality gate (integer density > QcThreshold);
    *   4. the ADMITTED set appends through the five index tables PLUS
    *      the decision-ledger row — six stages, one publish/discard;
    *   5. norms refold + fences advance, exactly as [[ingestAppend]].
    *
    * Epoch k+1's corpus probe sees base ∪ admitted(≤k): the sequential
    * dependence a real ingest has, and the DuckDB oracle replays it by
    * unrolling the epochs ([[graft.streaming.CurationStream]]).
    * Exactly-once under replay: the ledger row decides (a replayed
    * epoch no-ops), a torn stage under this epoch's id discards before
    * retrying. Returns true when the epoch DECIDED here. */
  def curateEpoch(s: SparkSession, base: String, batch: DataFrame,
      epochId: Long): Boolean =
    MaintenanceLease.withLease(base, "curateEpoch")(
      curateEpochImpl(s, base, batch, epochId))

  private def curateEpochImpl(s: SparkSession, base: String, batch: DataFrame,
      epochId: Long): Boolean = synchronized {
    // Finish any mid-publish crash first: if the roll-forward completes
    // THIS epoch's ledger publish, the epoch was decided by the
    // original run (the staged ledger row IS the original decision).
    val recovered = recoverTorn(s, base)
    if (epochDecided(s, base, epochId))
      return recovered.contains(s"curate-e$epochId")
    // The gated chain is ORDER-DEPENDENT (epoch k+1 gates against
    // admitted(≤k)); delivery order rests on the file source reading
    // unread files in mtime order — undocumented behavior. Verify it
    // here so an out-of-order delivery fails loudly instead of
    // silently deciding against the wrong standing set.
    if (epochId > 0 && !epochDecided(s, base, epochId - 1))
      throw new IllegalStateException(
        s"gated epoch $epochId delivered before epoch ${epochId - 1} " +
          "was decided — epochs must decide in order")
    val wapId = s"curate-e$epochId"
    val ct = corpusTable(base)
    val tp = textPath(base)
    val dp = dedupPath(base)
    for (p <- Seq(tp, dp); st <- IndexFence.staleness(p))
      if (st) throw new IllegalStateException(
        s"index at $p is STALE (out-of-band corpus drift): rebuild " +
          "before maintaining.")
    val postingsT = s"$tp/postings"
    val statsT = s"$tp/stats"
    val dfPartsT = s"$tp/dfparts"
    val passagesT = s"$tp/passages"
    val pstatsT = s"$tp/pstats"
    val pdfPartsT = s"$tp/pdfparts"
    val bandsT = s"$dp/bands"
    val shinglesT = s"$dp/shingles"
    val lt = ledgerTable(base)
    val allTables = Seq(ct, postingsT, statsT, dfPartsT,
      passagesT, pstatsT, pdfPartsT, bandsT, shinglesT, lt)
    // Clear any torn stage of THIS epoch (reverse-order / roll-forward
    // aware).
    ManifestFileSink.wapAbort(allTables, wapId)
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = b.count()
      if (total == 0) return false
      // ---- THE GATE (the curationIngest chain, per epoch).
      val corpusDups = DedupIndex.serve(s, dp, b)
        .select(col("d2").as("doc_id"))
      val bshAll = Dedup.shingleRows(b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inBatchDups = Dedup.jaccardPairsFromShingles(bshAll, 0.8, None)
        .select(col("d2").as("doc_id"))
      val dropped = corpusDups.unionByName(inBatchDups).distinct()
      val admitted = b.join(dropped, Seq("doc_id"), "left_anti")
        .withColumn("wl", split(col("text"), " "))
        .withColumn("cw",
          (size(col("wl")) - TextAnalysis.cnt(col("wl"), "the")
            - TextAnalysis.cnt(col("wl"), "a")).cast("long"))
        .filter(expr("(1000000L * cw) div n_chars") > lit(TextAnalysis.QcThreshold))
        .drop("wl", "cw")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nAdmitted = admitted.count()
      // ---- SIX-STAGE TRANSACTION over the admitted set.
      val bPost = TextIndex.postingRows(admitted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bPass = TextIndex.passageRows(admitted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bSh = Dedup.shingleRows(admitted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bBands = DedupIndex.bandTableRows(bSh)
      val bShRows = DedupIndex.shingleTableRows(bSh)
      import s.implicits._
      val ledgerRow = Seq((epochId, nAdmitted, total - nAdmitted))
        .toDF("epoch", "admitted", "rejected")
      def stage(df: DataFrame, path: String): Unit =
        df.write.format(fmt).option("path", path).option("wap-id", wapId)
          .mode("append").save()
      def wapView(path: String): DataFrame =
        s.read.format(fmt).option("path", path)
          .option("asOfManifest", s"wap:$wapId").load()
      def mainCount(path: String): Long =
        s.read.format(fmt).option("path", path).load().count()
      try {
        val pre = allTables.map(p => p -> mainCount(p)).toMap
        stage(admitted, ct)
        stage(bPost, postingsT)
        stage(TextIndex.statsRow(bPost), statsT)
        stage(TextIndex.dfPartRows(bPost), dfPartsT)
        stage(bPass, passagesT)
        stage(TextIndex.pstatsRow(bPass), pstatsT)
        stage(TextIndex.pdfPartRows(bPass), pdfPartsT)
        stage(bBands, bandsT)
        stage(bShRows, shinglesT)
        stage(ledgerRow, lt)
        val collisions = readCorpus(s, base).join(
          admitted.select(col("doc_id")), Seq("doc_id"), "left_semi").count()
        if (collisions > 0) throw new IllegalStateException(
          s"curated-epoch audit failed: $collisions admitted doc_ids " +
            "already in the corpus")
        val expected = Map(
          ct -> nAdmitted, postingsT -> bPost.count(), statsT -> 1L,
          dfPartsT -> TextIndex.dfPartRows(bPost).count(),
          passagesT -> bPass.count(), pstatsT -> 1L,
          pdfPartsT -> TextIndex.pdfPartRows(bPass).count(),
          bandsT -> bBands.count(), shinglesT -> bShRows.count(), lt -> 1L)
        for (p <- allTables) {
          val grew = wapView(p).count() - pre(p)
          if (grew != expected(p)) throw new IllegalStateException(
            s"curated-epoch audit failed: $p staged $grew rows, expected " +
              s"${expected(p)}")
        }
        allTables.foreach(p => ManifestFileSink.wapPublish(p, wapId))
      } catch {
        case e: Throwable =>
          ManifestFileSink.wapAbort(allTables, wapId)
          throw e
      } finally {
        bPost.unpersist(); bPass.unpersist(); bSh.unpersist()
        bshAll.unpersist(); admitted.unpersist()
      }
      s.catalog.refreshByPath(postingsT)
      TextIndex.writeNorms(s,
        s.read.format(fmt).option("path", postingsT).load(), tp)
      s.catalog.refreshByPath(ct)
      val fp = IndexFence.fingerprint(ct)
      IndexFence.write(tp, ct, fp)
      IndexFence.write(dp, ct, fp)
      true
    } finally b.unpersist()
  }

  /** ensure → ingest-once → serve; the shared entry skeleton. */
  private def maintained(s: SparkSession, dir: String): String = {
    val base = ensureBase(s, dir)
    if (!batchApplied(s, base)) {
      ingestAppend(s, base,
        Tables(s, dir).documents.filter(col("doc_id") % 13 === AppendClass))
      // The ingest advanced the corpus: make both index paths re-list.
      s.catalog.refreshByPath(corpusTable(base))
    }
    base
  }

  /** Oracle-gated: BM25 serve from the MAINTAINED text index — built
    * over `%13 ∉ {5,6}`, extended by the class-6 append, so the served
    * universe is exactly `%13 ≠ 5` and DuckDB replays it from the one
    * documents table while the plan reads probed buckets of a table
    * that was never rebuilt. Hash-identical to a full rebuild by the
    * segment-append design (df from probed rows, stats folded). */
  def textIndexAppend: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintained(s, dir)
    TextIndex.serve(s, textPath(base), Seq("dup", "spark", "window"))
  }

  /** Oracle-gated: near-dup probe of the class-5 batch against the
    * MAINTAINED dedup index. Class-6 docs appear as `d1` in the result
    * pairs, so a dropped band/shingle append is a missing row — the
    * oracle sees it. */
  def dedupIndexAppend: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintained(s, dir)
    DedupIndex.serve(s, dedupPath(base),
      Tables(s, dir).documents.filter(col("doc_id") % 13 === ProbeClass))
  }

  /** Oracle-gated: COMPACT the maintained postings table back to one
    * file per term bucket, then serve — the maintenance loop's third
    * verb (build → append → compact). Each appended segment adds one
    * file per touched bucket, so a probed serve opens `segments` files
    * per term; compaction folds them with
    * [[ManifestFileSink.repartitionTable]] (cluster by the bucket
    * column → ONE task owns each bucket → one attested file, sort
    * attestations re-earned) and is gated on the published segment
    * count so an already-compacted table pays a metadata read, not a
    * rewrite. Serve is hash-identical before/after BY CONSTRUCTION:
    * postings rows are preserved exactly, df derives from probed rows,
    * stats and norms tables are untouched — the same oracle as the
    * append entry replays it. The corpus never changed, so the fence
    * is untouched by design (it fingerprints the corpus chain, not the
    * index files).
    *
    * At 100 TB: compaction cost is one clustered rewrite of the
    * postings table (~1% of corpus bytes), amortized over however many
    * appends accumulated — the knob is the segment-count threshold,
    * here 1 because the entry exists to prove the fold, in production
    * more like 16–64. */
  /** Compact the text index's partial/stats tables too: NET the
    * per-segment rows (sum per key, drop fully-retracted ≤0 keys)
    * instead of just relocating them (verdict-r17 Next #4). Without
    * this the dfparts/stats/pstats/pdfparts tables accumulate one row
    * set per append/delete FOREVER, and serve's "O(segments) metadata
    * fold" grows without bound on a long-maintained index; netting at
    * compaction restores serve to O(terms) — and it is hash-invariant
    * by construction, because every consumer of these tables reads
    * them through a SUM (serve's df fold, the stats fold, the norms
    * refold, the audit's mass invariants) and summing netted partials
    * equals summing the originals. One rewrite commit per table, the
    * same crash-safety as the postings fold. */
  private[llm] def netPartials(s: SparkSession, tp: String): Unit = {
    for (t <- Seq(s"$tp/dfparts", s"$tp/pdfparts"))
      if (ManifestFileSink.publishedManifestCount(t) > 1) {
        ManifestFileSink.rewriteTable(s, t,
          df => df.groupBy(col("tok"), col("tb"))
            .agg(sum(col("dfp")).as("dfp"))
            .filter(col("dfp") > 0),
          clusterCols = Seq("tb"), numFiles = 64)
        s.catalog.refreshByPath(t)
      }
    for ((t, cnt, sm) <- Seq((s"$tp/stats", "n_docs", "sum_dl"),
        (s"$tp/pstats", "n_chunks", "sum_dl")))
      if (ManifestFileSink.publishedManifestCount(t) > 1) {
        ManifestFileSink.rewriteTable(s, t,
          df => df.agg(sum(col(cnt)).as(cnt), sum(col(sm)).as(sm)),
          numFiles = 1)
        s.catalog.refreshByPath(t)
      }
  }

  def textIndexCompact: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintained(s, dir)
    // Postings/passages fold back to one file per term bucket (rows
    // preserved exactly); the partials/stats tables NET — see
    // [[netPartials]].
    MaintenanceLease.withLease(base, "compact") {
      for (t <- Seq(s"${textPath(base)}/postings", s"${textPath(base)}/passages"))
        if (ManifestFileSink.publishedManifestCount(t) > 1) {
          ManifestFileSink.repartitionTable(s, t, Seq("tb"), 64)
          s.catalog.refreshByPath(t)
        }
      netPartials(s, textPath(base))
    }
    TextIndex.serve(s, textPath(base), Seq("dup", "spark", "window"))
  }

  /** Oracle-gated: COMPACT the maintained DEDUP index's two tables —
    * bands back to one file per band bucket (`bb`), shingles per doc
    * bucket (`db`) — then probe the class-5 batch. The compaction verb
    * operates on the manifest layer, so it carries from the postings
    * table to these unchanged: rows preserved exactly (both tables are
    * per-doc, no global statistic), serve hash-identical, fences
    * untouched. Gated per table on the published segment count so an
    * already-compacted table pays a metadata read. */
  def dedupIndexCompact: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintained(s, dir)
    val dp = dedupPath(base)
    MaintenanceLease.withLease(base, "compact") {
      for ((t, c) <- Seq(s"$dp/bands" -> "bb", s"$dp/shingles" -> "db"))
        if (ManifestFileSink.publishedManifestCount(t) > 1) {
          ManifestFileSink.repartitionTable(s, t, Seq(c), 32)
          s.catalog.refreshByPath(t)
        }
    }
    DedupIndex.serve(s, dp,
      Tables(s, dir).documents.filter(col("doc_id") % 13 === ProbeClass))
  }

  /** Oracle-gated: VACUUM — the maintenance loop's retention verb
    * (build → append → compact → vacuum). Compaction's superseding
    * manifest retires the pre-fold segments but deliberately leaves
    * their data files on disk (in-flight scans may still hold them);
    * vacuum reclaims every file no manifest references once the safety
    * window passes. Here the window is 0 because the entry IS the
    * quiescent maintenance job; production uses the snapshot-retention
    * horizon. Serve is untouched by construction — vacuum deletes only
    * unreferenced files, and the audit that it did is the same append
    * oracle hashing the served rows.
    *
    * At 100 TB: vacuum is a pure metadata-diff + delete pass (list the
    * data dir, subtract the referenced set) — no data bytes read; the
    * cost scales with FILE COUNT, which compaction just bounded to one
    * per bucket. */
  def textIndexVacuum: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintained(s, dir)
    MaintenanceLease.withLease(base, "vacuum") {
      for (t <- Seq(s"${textPath(base)}/postings", s"${textPath(base)}/dfparts",
          s"${textPath(base)}/passages", s"${textPath(base)}/pdfparts")) {
        if (ManifestFileSink.publishedManifestCount(t) > 1) {
          ManifestFileSink.repartitionTable(s, t, Seq("tb"), 64)
          s.catalog.refreshByPath(t)
        }
        ManifestFileSink.vacuum(t, olderThanMs = 0L)
      }
    }
    TextIndex.serve(s, textPath(base), Seq("dup", "spark", "window"))
  }

  /** Oracle-gated: cross-table CONSISTENCY audit of the maintained base
    * — the invariant set a production maintenance job re-checks after
    * every transaction: each index table's doc-grain membership derives
    * exactly from the corpus it fences on (postings/norms/stats cover
    * every doc; bands/shingles cover every ≥3-word doc). The DuckDB
    * oracle recomputes each expected count from the one documents
    * table, so a lost append on ANY of the five tables — or a torn
    * stage that half-published — is a hash miss on its row.
    *
    * At 100 TB: corpus/norms/stats rows are metadata-answered (COUNT
    * pushdown; stats is one row per segment); the two distinct-doc
    * probes read the index tables (~1% of corpus bytes), never the
    * corpus text. */
  def indexConsistencyAudit: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintained(s, dir)
    val tp = textPath(base)
    val dp = dedupPath(base)
    def tbl(p: String): DataFrame = s.read.format(fmt).option("path", p).load()
    def row(name: String, n: DataFrame): DataFrame =
      n.select(lit(name).as("invariant"), col("n"))
    Seq(
      row("bands_docs",
        tbl(s"$dp/bands").agg(countDistinct(col("doc_id")).as("n"))),
      row("corpus_rows", tbl(corpusTable(base)).agg(count(lit(1)).as("n"))),
      row("norms_rows", tbl(s"$tp/norms").agg(count(lit(1)).as("n"))),
      row("dfparts_mass",
        tbl(s"$tp/dfparts").agg(sum(col("dfp")).as("n"))),
      row("postings_docs",
        tbl(s"$tp/postings").agg(countDistinct(col("doc_id")).as("n"))),
      row("shingles_docs",
        tbl(s"$dp/shingles").agg(countDistinct(col("doc_id")).as("n"))),
      row("stats_docs", tbl(s"$tp/stats").agg(sum(col("n_docs")).as("n"))))
      .reduce(_.unionByName(_)).orderBy(col("invariant"))
  }

  /** The delete entries keep their OWN managed base so the retraction
    * can't disturb the append/compact entries' fences on the shared
    * /tmp. */
  def deleteBasePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_delete", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** The standard retraction window: documents `[100, 300)` — present
    * at every test SF, overlapping both the base classes and the
    * appended class 6, so the delete retracts rows from EVERY segment
    * kind. */
  private[llm] val DelLo = 100L
  private[llm] val DelHi = 300L

  /** ensure → append-once → delete-once; idempotent across runs (the
    * replayed range finds only masked victims and no-ops). */
  private def maintainedDeleted(s: SparkSession, dir: String): String = {
    val base = ensureBaseAt(s, dir, deleteBasePath(dir))
    if (!batchApplied(s, base)) {
      ingestAppend(s, base,
        Tables(s, dir).documents.filter(col("doc_id") % 13 === AppendClass))
      s.catalog.refreshByPath(corpusTable(base))
    }
    deleteRange(s, base, DelLo, DelHi)
    base
  }

  /** Oracle-gated: BM25 serve AFTER the retraction — the maintained
    * universe is `%13 ≠ 5 minus [100, 300)` and DuckDB replays it from
    * the one documents table while the plan reads a table that was
    * never rebuilt (deletion vectors mask victims, negative partials
    * fold df, the negative stats row folds n_docs/sum_dl). */
  def textIndexDelete: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintainedDeleted(s, dir)
    TextIndex.serve(s, textPath(base), Seq("dup", "spark", "window"))
  }

  /** Oracle-gated: near-dup probe of the class-5 batch against the
    * POST-delete dedup index — a retracted doc must vanish from the
    * candidate pairs (its bands are masked), which the oracle's d1
    * universe pins. */
  def dedupIndexDelete: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintainedDeleted(s, dir)
    DedupIndex.serve(s, dedupPath(base),
      Tables(s, dir).documents.filter(col("doc_id") % 13 === ProbeClass))
  }

  /** The PURGE maintenance verb — the copy-on-write half of the delete
    * story (deletion vectors are merge-on-read: every scan pays the
    * mask until the files fold). [[ManifestFileSink.applyDeletes]]
    * streams each DV-touched file once into a replacement with the dead
    * rows dropped, supersedes the history, and leaves the originals for
    * [[ManifestFileSink.vacuum]]; content is unchanged by construction,
    * so serve is hash-identical and the fences simply re-advance to the
    * purged chain (the purge IS maintained drift). The vector sibling's
    * trained-over marker is left alone: it already mismatched at the
    * delete (by design — the retrain door), and a purge changes no
    * content the centroids could retrain differently over.
    *
    * At 100 TB: purge cost is one streamed rewrite of ONLY the files
    * the vectors touch (victim-window locality keeps that a small
    * fraction), amortized over however many deletes accumulated;
    * after it, scans stop paying the mask and vacuum reclaims the
    * originals' bytes. */
  def purgeDeletes(s: SparkSession, base: String): Int =
    MaintenanceLease.withLease(base, "purgeDeletes")(purgeDeletesImpl(s, base))

  private def purgeDeletesImpl(s: SparkSession, base: String): Int = synchronized {
    val ct = corpusTable(base)
    val tp = textPath(base)
    val dp = dedupPath(base)
    recoverTorn(s, base)
    val tables = Seq(ct, s"$tp/postings", s"$tp/passages",
      s"$dp/bands", s"$dp/shingles")
    val purged = tables.map { t =>
      val n = ManifestFileSink.applyDeletes(t)
      ManifestFileSink.vacuum(t, olderThanMs = 0L)
      s.catalog.refreshByPath(t)
      n
    }.sum
    if (purged > 0) {
      s.catalog.refreshByPath(ct)
      val fp = IndexFence.fingerprint(ct)
      IndexFence.write(tp, ct, fp)
      IndexFence.write(dp, ct, fp)
    }
    purged
  }

  /** Oracle-gated: serve after delete-then-PURGE — the same survivor
    * universe as `text_index_delete` (purge preserves every surviving
    * row by construction), with the plan now reading rewritten files
    * that carry NO deletion vectors. */
  def textIndexPurge: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintainedDeleted(s, dir)
    purgeDeletes(s, base)
    TextIndex.serve(s, textPath(base), Seq("dup", "spark", "window"))
  }

  /** Oracle-gated: the consistency audit run over the POST-delete base
    * — every folded statistic (stats, dfparts, pstats) must NET to the
    * survivor grain after the negative rows, and every per-doc table
    * must cover exactly the survivors. Extends the append audit with
    * the passage-table invariants (chunk coverage = Σ 1+(len−1)/24 over
    * survivor docs). A delete that dropped a negative row, or one that
    * missed a table, is a hash miss on its invariant row. */
  def indexDeleteAudit: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = maintainedDeleted(s, dir)
    val tp = textPath(base)
    val dp = dedupPath(base)
    def tbl(p: String): DataFrame = s.read.format(fmt).option("path", p).load()
    def row(name: String, n: DataFrame): DataFrame =
      n.select(lit(name).as("invariant"), col("n"))
    Seq(
      row("bands_docs",
        tbl(s"$dp/bands").agg(countDistinct(col("doc_id")).as("n"))),
      row("corpus_rows", tbl(corpusTable(base)).agg(count(lit(1)).as("n"))),
      row("dfparts_mass", tbl(s"$tp/dfparts").agg(sum(col("dfp")).as("n"))),
      row("norms_rows", tbl(s"$tp/norms").agg(count(lit(1)).as("n"))),
      row("passages_docs",
        tbl(s"$tp/passages").agg(countDistinct(col("doc_id")).as("n"))),
      row("postings_docs",
        tbl(s"$tp/postings").agg(countDistinct(col("doc_id")).as("n"))),
      row("pstats_chunks",
        tbl(s"$tp/pstats").agg(sum(col("n_chunks")).as("n"))),
      row("shingles_docs",
        tbl(s"$dp/shingles").agg(countDistinct(col("doc_id")).as("n"))),
      row("stats_docs", tbl(s"$tp/stats").agg(sum(col("n_docs")).as("n"))))
      .reduce(_.unionByName(_)).orderBy(col("invariant"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_index_append" -> textIndexAppend,
    "index_delete_audit" -> indexDeleteAudit,
    "text_index_delete" -> textIndexDelete,
    "text_index_purge" -> textIndexPurge,
    "dedup_index_delete" -> dedupIndexDelete,
    "dedup_index_append" -> dedupIndexAppend,
    "text_index_compact" -> textIndexCompact,
    "dedup_index_compact" -> dedupIndexCompact,
    "text_index_vacuum" -> textIndexVacuum,
    "index_consistency_audit" -> indexConsistencyAudit)

  /** BM25 over a parameterized corpus universe — [[TextAnalysis
    * .bm25Sql]] with the corpus CTE restricted to the maintained
    * corpus' membership (append: `%13 ≠ 5`; delete: additionally minus
    * the retraction window). */
  private def bm25OverSql(universe: String): String =
    s"""WITH dl AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |         string_split(text, ' ') AS wl
      |  FROM documents WHERE $universe),
      |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
      |toks AS (SELECT doc_id, dl, UNNEST(wl) AS tok FROM dl),
      |tf AS (
      |  SELECT doc_id, dl, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('dup', 'spark', 'window') GROUP BY 1, 2, 3),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT tf.doc_id,
      |    ((s.n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
      |      * (tf.tf * CAST(2.2 AS DOUBLE))
      |      / (tf.tf + CAST(1.2 AS DOUBLE) *
      |         (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
      |          CAST(0.75 AS DOUBLE) * tf.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS sc
      |  FROM tf JOIN df USING (tok) CROSS JOIN stats s)
      |SELECT doc_id, ROUND(SUM(sc), 6) AS bm25, COUNT(*) AS n_terms
      |FROM scored GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  val textIndexAppendSql: String = bm25OverSql("doc_id % 13 <> 5")

  val textIndexDeleteSql: String = bm25OverSql(
    "doc_id % 13 <> 5 AND NOT (doc_id >= 100 AND doc_id < 300)")

  /** Cross-split exact-Jaccard pairs with the d1 (standing) universe
    * shrunk by the retraction window — the post-delete twin of
    * [[DedupIndex]]'s serve oracle. */
  val dedupIndexDeleteSql: String =
    """WITH wl AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(wl[x+1:x+3], ' ') AS sh
      |       FROM wl, UNNEST(range(len(wl)-2)) AS t(x)),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      |          FROM sh a JOIN sh b ON a.sh = b.sh
      |          WHERE a.doc_id % 13 <> 5
      |            AND NOT (a.doc_id >= 100 AND a.doc_id < 300)
      |            AND b.doc_id % 13 = 5
      |          GROUP BY 1, 2)
      |SELECT d1, d2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
      |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8
      |ORDER BY d1, d2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "text_index_append" -> textIndexAppendSql,
    // Serve over corpus-minus-deleted: DuckDB recomputes the whole
    // universe; the plan reads masked postings + folded negatives.
    "text_index_delete" -> textIndexDeleteSql,
    // Purge preserves every surviving row: the delete oracle replays it.
    "text_index_purge" -> textIndexDeleteSql,
    "index_delete_audit" ->
      """WITH c AS (
        |  SELECT doc_id, string_split(text, ' ') AS wl
        |  FROM documents WHERE doc_id % 13 <> 5
        |    AND NOT (doc_id >= 100 AND doc_id < 300))
        |SELECT * FROM (
        |  SELECT 'bands_docs' AS invariant,
        |    (SELECT COUNT(*) FROM c WHERE len(wl) >= 3) AS n
        |  UNION ALL SELECT 'corpus_rows', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'dfparts_mass',
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT doc_id, UNNEST(wl) FROM c))
        |  UNION ALL SELECT 'norms_rows', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'passages_docs', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'pstats_chunks',
        |    (SELECT CAST(SUM(1 + (len(wl) - 1) // 24) AS BIGINT) FROM c)
        |  UNION ALL SELECT 'postings_docs', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'shingles_docs',
        |    (SELECT COUNT(*) FROM c WHERE len(wl) >= 3)
        |  UNION ALL SELECT 'stats_docs', (SELECT COUNT(*) FROM c)
        |) ORDER BY invariant""".stripMargin,
    "dedup_index_delete" -> dedupIndexDeleteSql,
    // The maintained corpus is exactly %13 ≠ 5 — the same universe the
    // standalone serve entry replays.
    "dedup_index_append" -> DedupIndex.oracleSql("dedup_index_serve"),
    // Compaction preserves every posting row, so the append oracle
    // replays the compacted serve unchanged.
    "text_index_compact" -> textIndexAppendSql,
    // Both dedup tables are per-doc: the fold moves files, not rows.
    "dedup_index_compact" -> DedupIndex.oracleSql("dedup_index_serve"),
    // Vacuum deletes only unreferenced files — served rows identical.
    "text_index_vacuum" -> textIndexAppendSql,
    "index_consistency_audit" ->
      """WITH c AS (
        |  SELECT doc_id, string_split(text, ' ') AS wl
        |  FROM documents WHERE doc_id % 13 <> 5)
        |SELECT * FROM (
        |  SELECT 'bands_docs' AS invariant,
        |    (SELECT COUNT(*) FROM c WHERE len(wl) >= 3) AS n
        |  UNION ALL SELECT 'corpus_rows', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'dfparts_mass',
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT doc_id, UNNEST(wl) FROM c))
        |  UNION ALL SELECT 'norms_rows', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'postings_docs', (SELECT COUNT(*) FROM c)
        |  UNION ALL SELECT 'shingles_docs',
        |    (SELECT COUNT(*) FROM c WHERE len(wl) >= 3)
        |  UNION ALL SELECT 'stats_docs', (SELECT COUNT(*) FROM c)
        |) ORDER BY invariant""".stripMargin)
}
