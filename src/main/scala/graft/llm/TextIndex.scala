package graft.llm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ManifestFileSink, Tables}

/** PERSISTED inverted text index, served by partition-pruned scans —
  * the lexical sibling of [[VectorIndex]]: every `text_bm25`-family
  * entry builds its postings inside the query (right for a
  * self-contained oracle); a production search system builds the index
  * ONCE and each query pays only the buckets holding its terms.
  *
  * BUILD ([[build]]): one corpus tokenization pass folds the postings
  * relation `(tok, tb, doc_id, dl, tf)` — tf per (doc, term), doc
  * length riding the grouping key — written as a manifest table
  * `PARTITIONED BY (tb)` where `tb = pmod(xxhash64(tok), Buckets)` is
  * a precomputed TERM BUCKET column: the clustered write demuxes one
  * data file per bucket, each file's bucket proven by its zone map.
  * A corpus-stats table (one row PER SEGMENT: initial build + each
  * maintained append — serve folds them) sits beside it. df is
  * deliberately NOT denormalized onto posting rows: a stored df
  * freezes at write time and an appended segment moves df for every
  * shared term; serve derives it from the probed rows instead (which
  * it already reads in full per query term) — the segment-append
  * design [[graft.llm.IndexMaintenance]] builds on. Terms hash
  * ~uniformly across buckets, so bucket files stay balanced no matter
  * how Zipf the term distribution of any ONE document is.
  *
  * SERVE ([[serve]]): hash the query's terms to their buckets (one
  * tiny Spark job — the SAME xxhash64 expression the build used, so
  * driver and data can never disagree), read the postings table with a
  * static `tb IN (probed)` + `tok IN (terms)` filter — the sink's
  * partition pruning opens ONLY the probed buckets' files
  * (TextIndexSpec pins filesRead + filesPruned == bucket files, read <
  * all) — and score Robertson–Walker BM25 (k1=1.2, b=0.75, rational
  * RSJ idf) from the stored tf/dl with df folded from the probed rows
  * (one |terms|-row broadcast). The arithmetic is
  * [[TextAnalysis.bm25]]'s verbatim over identical integers, so the
  * served ranking is bit-identical to the in-query entry and the same
  * DuckDB oracle replays it while the PLAN reads the persisted table.
  *
  * Staleness fence: corpus fingerprint recorded at build (the
  * [[VectorIndex]] discipline — file names + mtimes + lengths, one
  * metadata listing); serve REFUSES a drifted index with the rebuild
  * instruction, build rebuilds in place, a torn build reads as
  * pre-fence and rebuilds.
  *
  * At 100 TB: the postings table is the big artifact (≈ one row per
  * distinct (doc, term)); a query touches |terms| buckets of it — each
  * 1/Buckets of the index — plus a one-row stats table. Raise Buckets
  * with corpus size to hold the per-file slice flat; the build is one
  * map-side-combinable fold + one df join, no corpus self-join. */
object TextIndex {

  private val Buckets = 64

  /** On-disk layout version (see [[IndexFence.layoutFile]]). History:
    * v0/untagged = pre-versioning (round-14 and earlier: postings
    * carried a STORED `df` column, frozen at write time); v2 = the
    * segment-append layout (postings `tok,tb,doc_id,dl,tf` — df derived
    * by RE-COUNTING the probed posting rows at serve, per-segment stats
    * rows, doc-bucketed norms); v3 (verdict-r16 #4) adds the `dfparts`
    * table — per-segment `(tok, tb, dfp)` document-frequency PARTIALS,
    * term-bucketed like the postings — so serve folds |terms| stored
    * partial rows instead of aggregating every probed posting row per
    * query, and the norms refold stops re-counting df too. Appends stay
    * exact: a segment's partials sum with the standing ones (and a
    * retraction appends NEGATIVE partials — the sum-fold absorbs both).
    * A version mismatch — including any pre-versioning index a
    * persistent /tmp carries across runs — forces one clean rebuild in
    * [[buildFrom]]; serving a legacy layout would either join a second
    * `df` onto postings that already store one (the round-15
    * AMBIGUOUS_REFERENCE) or miss the dfparts table entirely.
    * v4 (r17, verdict-r16 #6) adds the PASSAGE tables — `passages`
    * (chunk-grain postings `tok, tb, doc_id, chunk_idx, dl, tf` over
    * the 32/24 sliding windows), `pstats` (per-segment chunk count +
    * length mass) and `pdfparts` (per-segment chunk-frequency partials)
    * — so max-passage retrieval serves from probed buckets instead of
    * re-chunking the corpus per query. */
  private[llm] val LayoutVersion = 4

  /** Passage window geometry — [[graft.llm.TextAnalysis.passageBm25]]'s
    * 32-token chunks on a 24-token stride, shared so the index build
    * and the in-query entry can never disagree. */
  private[llm] val ChunkLen = 32
  private[llm] val Stride = 24

  private def fmt = classOf[ManifestFileSink].getName

  def indexPath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_textindex", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  private def corpusPath(dir: String): String = s"$dir/documents.parquet"

  /** None = no/pre-fence index; Some(true) = corpus drifted since build. */
  def staleness(path: String): Option[Boolean] = IndexFence.staleness(path)

  private def tb(tok: org.apache.spark.sql.Column) =
    pmod(xxhash64(tok), lit(Buckets.toLong))

  private val DocBuckets = 64

  private def db(docId: org.apache.spark.sql.Column) =
    pmod(docId, lit(DocBuckets.toLong))

  private def refuseStale(path: String): Unit = staleness(path) match {
    case Some(true) =>
      val corpus = IndexFence.read(path).map(_._1).getOrElse("<unknown>")
      throw new IllegalStateException(
        s"text index at $path is STALE: corpus $corpus changed since " +
          "build. Rebuild via TextIndex.build(spark, dir, path).")
    case _ =>
  }

  /** Tokenize + fold + write. No-op when already built and provably
    * fresh; a drifted or pre-fence index rebuilds from scratch. */
  def build(s: SparkSession, dir: String, path: String): Unit =
    buildFrom(s, Tables(s, dir).documents, corpusPath(dir), path)

  /** The per-document posting rows of one corpus slice — `(tok, tb,
    * doc_id, dl, tf)`. df is NOT stored (the segment-append decision:
    * a stored df freezes at write time, and an appended segment changes
    * df for terms it shares with the standing corpus — serve derives
    * df from the probed rows instead, see [[withDf]]). Extracted so the
    * incremental maintenance path appends rows built by the SAME
    * expressions as the full build. */
  private[llm] def postingRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .select(col("tok"), tb(col("tok")).as("tb"), col("doc_id"),
        col("dl"), col("tf"))

  /** One segment's corpus-stats row from its posting rows. The stats
    * table holds ONE ROW PER SEGMENT (initial build + each maintained
    * append); serve folds them, so global n_docs/sum_dl are exact after
    * any number of appends. */
  private[llm] def statsRow(postings: DataFrame): DataFrame =
    postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** One segment's document-frequency PARTIALS from its posting rows —
    * `(tok, tb, dfp)` where dfp = this segment's doc count for the
    * term. Global df = SUM of a term's partials across segments (rows
    * are unique per (doc, term) across segments — the append audit —
    * so partial counts add exactly; a retraction contributes negative
    * partials and the same fold stays exact). Term-bucketed by the
    * postings' own `tb`, so serve reads partials from the SAME probed
    * buckets it already opens. */
  private[llm] def dfPartRows(postings: DataFrame): DataFrame =
    postings.groupBy(col("tok"), col("tb")).agg(count(lit(1)).as("dfp"))

  /** One corpus slice's CHUNK-grain posting rows — `(tok, tb, doc_id,
    * chunk_idx, dl, tf)`, one row per (chunk, term): the 32/24 sliding
    * windows of [[graft.llm.TextAnalysis.passageBm25]], exploded to an
    * inverted index over ALL tokens so ANY query's passages serve from
    * probed term buckets. Every document yields ≥1 chunk (an empty
    * text still splits to one token), so chunk coverage equals corpus
    * coverage — the audit grain. */
  private[llm] def passageRows(docs: DataFrame): DataFrame =
    docs.withColumn("wl", split(col("text"), " "))
      .select(col("doc_id"), col("wl"),
        posexplode(filter(sequence(lit(0), size(col("wl")) - 1),
          st => st % Stride === 0)).as(Seq("chunk_idx", "st")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("wl"), col("st") + 1, lit(ChunkLen)).as("cw"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("cw")).cast("long").as("dl"),
        explode(col("cw")).as("tok"))
      .groupBy(col("doc_id"), col("chunk_idx"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .select(col("tok"), tb(col("tok")).as("tb"), col("doc_id"),
        col("chunk_idx"), col("dl"), col("tf"))

  /** One segment's chunk-grain stats row — `(n_chunks, sum_dl)` over
    * the segment's distinct chunks. Folds across segments like
    * [[statsRow]]; a retraction appends the negated row. */
  private[llm] def pstatsRow(passages: DataFrame): DataFrame =
    passages.select(col("doc_id"), col("chunk_idx"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_chunks"), sum(col("dl")).as("sum_dl"))

  /** One segment's chunk-frequency partials — `(tok, tb, dfp)` where
    * dfp = this segment's CHUNK count for the term (rows are unique per
    * (chunk, term), so partials sum exactly; retractions negate). */
  private[llm] def pdfPartRows(passages: DataFrame): DataFrame =
    passages.groupBy(col("tok"), col("tb")).agg(count(lit(1)).as("dfp"))

  /** Build over an explicit corpus (the managed-corpus maintenance path
    * fences on its OWN table; the classic path fences on the testdata
    * parquet). */
  private[graft] def buildFrom(s: SparkSession, corpus: DataFrame,
      fenceCorpus: String, path: String): Unit = synchronized {
    val postingsPath = s"$path/postings"
    val statsPath = s"$path/stats"
    val normsPath = s"$path/norms"
    val dfPartsPath = s"$path/dfparts"
    val passagesPath = s"$path/passages"
    val pstatsPath = s"$path/pstats"
    val pdfPartsPath = s"$path/pdfparts"
    val built = Files.isDirectory(Paths.get(postingsPath)) && {
      val l = Files.list(Paths.get(postingsPath))
      try l.iterator().hasNext finally l.close()
    }
    // A fresh fence no-ops ONLY when the on-disk layout is the one this
    // code serves: the version tag (v2 = segment-append, df derived at
    // serve) catches a pre-refactor index whose postings still store df
    // (round-15's AMBIGUOUS_REFERENCE regression), and the norms-dir
    // check catches the older pre-hybrid layout — both rebuild cleanly
    // instead of crashing serve.
    if (built && staleness(path).contains(false) &&
        IndexFence.readLayout(path) == LayoutVersion &&
        Files.isDirectory(Paths.get(normsPath))) return
    if (built) {
      s.catalog.refreshByPath(fenceCorpus)
      for (t <- Seq(postingsPath, statsPath, normsPath, dfPartsPath,
          passagesPath, pstatsPath, pdfPartsPath))
        IndexFence.rmTree(Paths.get(t))
      IndexFence.clear(path)
    }
    val fp = IndexFence.fingerprint(fenceCorpus)
    val tf = postingRows(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Files.createDirectories(Paths.get(postingsPath))
    ManifestFileSink.setPartitionColumn(postingsPath, "tb")
    // The posting write demuxes one attested file per term bucket.
    tf.write.format(fmt).option("path", postingsPath).mode("append").save()
    statsRow(tf).coalesce(1)
      .write.format(fmt).option("path", statsPath).mode("append").save()
    Files.createDirectories(Paths.get(dfPartsPath))
    ManifestFileSink.setPartitionColumn(dfPartsPath, "tb")
    dfPartRows(tf)
      .write.format(fmt).option("path", dfPartsPath).mode("append").save()
    // Passage (chunk-grain) tables — the max-passage retrieval layer.
    val ptf = passageRows(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Files.createDirectories(Paths.get(passagesPath))
    ManifestFileSink.setPartitionColumn(passagesPath, "tb")
    ptf.write.format(fmt).option("path", passagesPath).mode("append").save()
    pstatsRow(ptf).coalesce(1)
      .write.format(fmt).option("path", pstatsPath).mode("append").save()
    Files.createDirectories(Paths.get(pdfPartsPath))
    ManifestFileSink.setPartitionColumn(pdfPartsPath, "tb")
    pdfPartRows(ptf)
      .write.format(fmt).option("path", pdfPartsPath).mode("append").save()
    ptf.unpersist(blocking = true)
    writeNorms(s, tf, path)
    tf.unpersist(blocking = true)
    // Layout tag before the fence; fence LAST stays the commit point —
    // a crash anywhere before it reads as pre-fence and rebuilds.
    IndexFence.writeLayout(path, LayoutVersion)
    IndexFence.write(path, fenceCorpus, fp)
  }

  /** Per-document FULL tf-idf vector norms, (re)materialized from a
    * postings relation — the line [[TextAnalysis.rrfFusion]]'s doc
    * promises ("a production stack materializes norms once per corpus
    * build"): the cosine ranker's only corpus-grain input, one slim row
    * per doc, bucketed by doc id so hybrid serving prunes to the docs
    * its query terms touch. The weight expression is rrfFusion's
    * VERBATIM (tf·N/df over the same integers) so the stored doubles
    * are bit-identical. df and n_docs derive from the postings relation
    * itself (every norm shifts when N or any shared term's df moves, so
    * a maintained append recomputes this table from the PERSISTED
    * postings — index-grain, never a corpus re-tokenize). */
  private[llm] def writeNorms(s: SparkSession, postings: DataFrame,
      path: String): Unit = {
    val normsPath = s"$path/norms"
    IndexFence.rmTree(Paths.get(normsPath))
    Files.createDirectories(Paths.get(normsPath))
    ManifestFileSink.setPartitionColumn(normsPath, "db")
    // df and n_docs fold from the STORED partials/stats (written before
    // norms in both the build and every maintenance transaction) — the
    // refold reads two slim tables + the postings, never re-counting df
    // from corpus-grain rows (the v3 layout's point).
    s.catalog.refreshByPath(s"$path/dfparts")
    s.catalog.refreshByPath(s"$path/stats")
    val dfRel = s.read.format(fmt).option("path", s"$path/dfparts").load()
      .groupBy(col("tok")).agg(sum(col("dfp")).as("df"))
      .withColumnRenamed("tok", "df_tok")
    val n = s.read.format(fmt).option("path", s"$path/stats").load()
      .agg(sum(col("n_docs")).as("n_docs"))
    postings.join(dfRel, col("tok") === col("df_tok"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        (col("tf").cast("double") * col("n_docs") / col("df")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nd"))
      .select(col("doc_id"), db(col("doc_id")).as("db"), col("nd"))
      .write.format(fmt).option("path", normsPath).mode("append").save()
  }

  /** BM25 top-20 for `terms` from the persisted index. REFUSES a stale
    * index (the wrong-answer class the fence exists for). */
  /** The probed buckets, computed with the BUILD's own hash expression
    * (one |terms|-row job — a driver-side reimplementation of xxhash64
    * could silently disagree seed-for-seed; this cannot). */
  private def probedBuckets(s: SparkSession, terms: Seq[String]): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    s.createDataset(terms.asJava)(org.apache.spark.sql.Encoders.STRING)
      .select(tb(col("value")).as("tb")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
  }

  private def prunedPostings(s: SparkSession, path: String,
      terms: Seq[String], buckets: Seq[Long]): DataFrame =
    s.read.format(fmt).option("path", s"$path/postings").load()
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))

  /** Global df for each probed term = fold of its STORED per-segment
    * partials (v3 layout), read from the same probed term buckets the
    * postings scan opens — |terms| result rows from a slim
    * vocabulary-grain table, instead of re-aggregating every probed
    * posting row per query (the v2 shape the r16 verdict priced at ~2×
    * on the hybrid serve path). Exact after any append/retraction
    * because partials sum. */
  private def prunedDf(s: SparkSession, path: String,
      terms: Seq[String], buckets: Seq[Long]): DataFrame =
    s.read.format(fmt).option("path", s"$path/dfparts").load()
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
      .groupBy(col("tok")).agg(sum(col("dfp")).as("df"))
      // A retraction can net a term's partials to ZERO (every posting
      // deleted): the term has no surviving rows and must vanish here
      // too — the same membership the postings-derived fold gave — or
      // the hybrid query weight would divide by its zero df.
      .filter(col("df") > 0)
      .withColumnRenamed("tok", "df_tok")

  private def withDf(postings: DataFrame, dfRel: DataFrame): DataFrame =
    postings.join(broadcast(dfRel), col("tok") === col("df_tok")).drop("df_tok")

  /** Global corpus stats = fold of the per-segment stats rows. */
  private def readStats(s: SparkSession, path: String): DataFrame =
    s.read.format(fmt).option("path", s"$path/stats").load()
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))

  def serve(s: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    refuseStale(path)
    val buckets = probedBuckets(s, terms)
    val postings = withDf(prunedPostings(s, path, terms, buckets),
      prunedDf(s, path, terms, buckets))
    val stats = readStats(s, path)
    // Scoring arithmetic = TextAnalysis.bm25 verbatim over the stored
    // integers — identical doubles, identical ranking, same oracle.
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val dnorm = lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")
    val sc = col("idf") * (col("tf") * lit(2.2)) / (col("tf") + lit(1.2) * col("dnorm"))
    postings
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("idf", idf)
      .withColumn("dnorm", dnorm)
      .withColumn("sc", sc)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("sc")), 6).as("bm25"), count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** HYBRID retrieval (BM25 + tf-idf cosine, reciprocal-rank fused)
    * served ENTIRELY from the persisted index — the production shape of
    * [[TextAnalysis.rrfFusion]], which re-tokenizes the corpus for both
    * rankers on every query. Here the lexical ranker reads the probed
    * postings buckets (as [[serve]]) and the vector ranker reads the
    * SAME probed postings (its dot product only touches query-term
    * weights) plus the build-time `norms` table, pruned to the doc
    * buckets the query's postings actually hit — a bounded `db IN`
    * collect, the [[DedupIndex]] discipline. Every scoring expression
    * is rrfFusion's VERBATIM over identical stored values (weights
    * tf·N/df, norms √Σw², RSJ BM25, 6-dp rank rounding, 1/(60+r)
    * fusion), so the served ranking replays the same DuckDB oracle
    * while the plan opens only probed bucket files.
    *
    * At 100 TB: the query pays |terms| postings buckets + the norm
    * buckets of matching docs; the full corpus-grain work (tokenize,
    * df, norms) happened ONCE at build. Each ranker cuts its top-30
    * with orderBy+limit (bounded-heap TakeOrderedAndProject) and only
    * THEN ranks, so the rank windows see ≤30 rows by construction —
    * with a common query term the candidate set is corpus-scale, and
    * a candidate-grain rank window would be the single-task sort the
    * suite audit forbids. */
  def serveHybrid(s: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    refuseStale(path)
    val K = 30
    val buckets = probedBuckets(s, terms)
    val dfRel = prunedDf(s, path, terms, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = withDf(prunedPostings(s, path, terms, buckets), dfRel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = readStats(s, path)
    // --- ranker L: BM25 from stored integers (serve's expressions).
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val dnorm = lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")
    val sc = col("idf") * (col("tf") * lit(2.2)) / (col("tf") + lit(1.2) * col("dnorm"))
    val bm = postings
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("idf", idf)
      .withColumn("dnorm", dnorm)
      .withColumn("sc", sc)
      .groupBy(col("doc_id")).agg(round(sum(col("sc")), 6).as("bm"))
    // limit-then-rank: the top-30 cut is a bounded-heap
    // TakeOrderedAndProject (per-partition heaps + one <=30-row merge),
    // NOT a single-task sort over every candidate doc — with a common
    // query term the candidate set is corpus-scale, and under the shared
    // strict total order (6-dp score desc, doc_id) limit-then-rank is
    // row-for-row equal to the oracle's rank-then-filter.
    val rl = bm.orderBy(col("bm").desc, col("doc_id")).limit(K)
      .withColumn("r_lex",
        row_number().over(Window.orderBy(col("bm").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_lex"))
    // --- ranker V: tf-idf cosine from stored weights + built norms.
    val n = stats.select(col("n_docs"))
    val w = postings.crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        (col("tf").cast("double") * col("n_docs") / col("df")).as("w"))
    // Query vector straight from the stored df partials — no postings
    // re-scan: a term's dfparts row exists iff the term has ≥1 posting,
    // the exact membership the postings-derived distinct used to give.
    val qvec = dfRel.withColumnRenamed("df_tok", "tok")
      .crossJoin(broadcast(n))
      .select(col("tok"), (col("n_docs").cast("double") / col("df")).as("qw"))
    val qnorm = qvec.agg(sqrt(sum(col("qw") * col("qw"))).as("nq"))
    // Norm buckets of the candidate docs — bounded metadata (≤ DocBuckets).
    val probedDb = postings.select(db(col("doc_id")).as("db")).distinct()
      .collect().map(_.getLong(0)).sorted
    val norms = s.read.format(fmt).option("path", s"$path/norms").load()
      .filter(col("db").isin(probedDb: _*))
      .select(col("doc_id"), col("nd"))
    val cosScore = w.join(broadcast(qvec), "tok")
      .groupBy(col("doc_id")).agg(sum(col("w") * col("qw")).as("dot"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qnorm))
      .select(col("doc_id"), round(col("dot") / (col("nd") * col("nq")), 6).as("cos"))
    val rv = cosScore.orderBy(col("cos").desc, col("doc_id")).limit(K)
      .withColumn("r_vec",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_vec"))
    // --- fusion (rrfFusion verbatim).
    rl.join(rv, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_vec"),
        round(
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** MAX-PASSAGE BM25 served ENTIRELY from the persisted index — the
    * production shape of [[TextAnalysis.passageBm25]], which re-chunks
    * the corpus on every query; here the chunk generation happened ONCE
    * at build (the `passages` table) and a query pays |terms| probed
    * term buckets + two slim stat folds. Scoring is bit-identical to
    * the in-query entry: the per-chunk tf pivot restores the exact
    * integers (a stored row exists iff tf > 0 — the pivot's zero-fill
    * matches the in-query zero counts), df folds from the stored
    * chunk-frequency partials, n/sum_dl from the per-segment stats
    * rows, and the score is the SAME fixed left-associated three-term
    * double chain — so the same DuckDB oracle replays the ranking while
    * the plan opens only probed bucket files.
    *
    * At 100 TB: candidate chunks = chunks containing ≥1 query term
    * (probed buckets only, never a corpus re-chunk); the doc fold is
    * the one shuffle; top-20 is a bounded heap. */
  def servePassages(s: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    refuseStale(path)
    val buckets = probedBuckets(s, terms)
    val probed = s.read.format(fmt).option("path", s"$path/passages").load()
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
    val tfAggs = terms.map(t =>
      coalesce(max(when(col("tok") === t, col("tf"))), lit(0L)).as(s"tf_$t"))
    val m = probed.groupBy(col("doc_id"), col("chunk_idx"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    val stats = s.read.format(fmt).option("path", s"$path/pstats").load()
      .agg(sum(col("n_chunks")).as("n"), sum(col("sum_dl")).as("sum_dl"))
    val dfWide = terms.map(t =>
      coalesce(max(when(col("tok") === t, col("df"))), lit(0L)).as(s"df_$t"))
    val dfRow = s.read.format(fmt).option("path", s"$path/pdfparts").load()
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
      .groupBy(col("tok")).agg(sum(col("dfp")).as("df"))
      .filter(col("df") > 0)
      .agg(dfWide.head, dfWide.tail: _*)
    val g = stats.crossJoin(dfRow)
    val scored = m.crossJoin(broadcast(g))
    // The EXACT passageBm25 term chain over the restored integers.
    val termSc = terms.map { t =>
      when(col(s"tf_$t") > 0,
        ((col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5))) *
          (col(s"tf_$t") * lit(2.2)) /
          (col(s"tf_$t") + lit(1.2) *
            (lit(1.0) - lit(0.75) +
              lit(0.75) * col("dl") / (col("sum_dl").cast("double") / col("n")))))
        .otherwise(lit(0.0))
    }
    scored
      .withColumn("sc", round(termSc.reduceLeft(_ + _), 6))
      .filter(col("sc") > 0)
      .groupBy(col("doc_id"))
      .agg(max(col("sc")).as("bm25_passage"),
        max_by(col("chunk_idx"), struct(col("sc"), -col("chunk_idx")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"), col("bm25_passage"))
      .orderBy(col("bm25_passage").desc, col("doc_id"))
      .limit(20)
  }

  /** Oracle-gated entry: build-once then serve the standard query — the
    * results are bit-identical to [[TextAnalysis.bm25]] (same integers,
    * same expression tree), so the same DuckDB oracle replays it while
    * the plan reads the persisted bucketed table with partition pruning
    * instead of re-tokenizing the corpus. */
  def textIndexServe: (SparkSession, String) => DataFrame = (s, dir) => {
    val path = indexPath(dir)
    build(s, dir, path)
    serve(s, path, Seq("dup", "spark", "window"))
  }

  /** Oracle-gated hybrid entry: same contract as [[textIndexServe]],
    * replaying [[TextAnalysis.rrfFusionSql]] against the persisted
    * layout. */
  def textHybridIndexServe: (SparkSession, String) => DataFrame = (s, dir) => {
    val path = indexPath(dir)
    build(s, dir, path)
    serveHybrid(s, path, Seq("dup", "spark", "window"))
  }

  /** Oracle-gated passage entry: same contract, replaying
    * [[TextAnalysis.passageBm25Sql]] against the persisted chunk-grain
    * layout. */
  def textPassageIndexServe: (SparkSession, String) => DataFrame = (s, dir) => {
    val path = indexPath(dir)
    build(s, dir, path)
    servePassages(s, path, Seq("dup", "spark", "window"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_index_serve" -> textIndexServe,
    "text_hybrid_index_serve" -> textHybridIndexServe,
    "text_passage_index_serve" -> textPassageIndexServe)

  val oracleSql: Map[String, String] = Map(
    "text_index_serve" -> TextAnalysis.bm25Sql,
    "text_hybrid_index_serve" -> TextAnalysis.rrfFusionSql,
    // The passage sibling replays the in-query max-passage oracle while
    // the plan reads probed buckets of the persisted chunk index.
    "text_passage_index_serve" -> TextAnalysis.passageBm25Sql)
}
