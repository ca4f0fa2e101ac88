package graft.llm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ManifestFileSink, Tables}

/** PERSISTED minhash-LSH dedup index, served by partition-pruned scans —
  * the third leg of the persisted-index family ([[VectorIndex]] for ANN,
  * [[TextIndex]] for lexical retrieval, this for near-dup INGEST): every
  * in-query dedup entry re-signatures the whole corpus per run, which is
  * right for a self-contained oracle and wrong for the production shape —
  * an ingest pipeline signatures the ARRIVING batch only and probes the
  * standing corpus' index for collisions.
  *
  * BUILD ([[build]]): one corpus shingle pass feeds [[Dedup.bandRows]]
  * (the SAME banding expressions as the in-query entries — extracted to
  * a single definition so the hash family cannot fork) and writes TWO
  * manifest tables: `bands (band, bh, doc_id)` partitioned by
  * `bb = pmod(xxhash64(band, bh), BandBuckets)` — the band-bucket demux
  * that makes probing IO-bounded — and `shingles (doc_id, sh)`
  * partitioned by `db = pmod(doc_id, DocBuckets)` so exact verification
  * fetches candidate documents' shingle sets without a corpus re-scan.
  *
  * SERVE ([[serve]]): signature the batch in-query (same [[Dedup]]
  * kernels), hash its band keys to their buckets with the build's OWN
  * expression, read the band table under a `bb IN (probed)` filter (the
  * sink's partition pruning opens only those buckets' files —
  * DedupIndexSpec pins filesRead + filesPruned == bucket files, read <
  * all), equi-join on (band, bh) for corpus×batch candidates, then
  * exact-verify via [[Dedup.jaccardPairsFromShingles]] over the UNION of
  * the batch's in-query shingles and the candidates' `db`-pruned stored
  * shingles. Output: exact-Jaccard ≥ 0.8 (corpus doc, new doc) pairs —
  * the keep/drop decisions an incremental ingest applies.
  *
  * Both collected probe lists are BOUNDED METADATA: distinct `bb` values
  * (≤ BandBuckets = 32) and distinct `db` values (≤ DocBuckets = 32) —
  * never row data.
  *
  * Staleness fence: [[IndexFence]] — corpus fingerprint at build, serve
  * refuses drift, torn builds read as pre-fence and rebuild.
  *
  * At 100 TB: the band table is 8 rows × 16 bytes per corpus doc and the
  * shingle table ≈ one row per distinct (doc, 3-gram) — both written
  * once; a batch probe touches |batch bands| ≤ BandBuckets band buckets
  * and |candidate docs| ≤ DocBuckets shingle buckets. Raise the bucket
  * constants with corpus size to hold per-file slices flat; intra-batch
  * duplicates are a separate in-query [[Dedup.dedupMinhashLsh]] pass
  * over the (small) batch alone.
  *
  * Batch convention: `doc_id % 13 == 5` is the arriving batch (the
  * [[Dedup.incrementalDelta]] "added docs" split); the standing corpus
  * is everything else. The split keys the FENCED corpus parquet, so the
  * oracle replays both sides from the one `documents` table.
  */
object DedupIndex {

  private val BandBuckets = 32
  private val DocBuckets = 32
  private val Threshold = 0.8

  private def fmt = classOf[ManifestFileSink].getName

  /** On-disk layout version (see [[IndexFence.layoutFile]]; the
    * discipline verdict-r15 #1 established after the [[TextIndex]]
    * layout change shipped without one). v1 = band table `(band, bh,
    * bb, doc_id)` + shingle table `(doc_id, db, sh)`. An untagged index
    * reads as 0 and rebuilds once; any future schema change bumps this
    * constant instead of trusting a fresh fence over a layout the code
    * no longer matches. */
  private[llm] val LayoutVersion = 1

  def indexPath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_dedupindex", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  private def corpusPath(dir: String): String = s"$dir/documents.parquet"

  def staleness(path: String): Option[Boolean] = IndexFence.staleness(path)

  private def isBatch = col("doc_id") % 13 === 5

  private def bb = pmod(xxhash64(col("band"), col("bh")), lit(BandBuckets.toLong))

  private def db = pmod(col("doc_id"), lit(DocBuckets.toLong))

  /** Shingle + signature the standing corpus once; write the band and
    * shingle tables. No-op when already built and provably fresh. */
  def build(s: SparkSession, dir: String, path: String): Unit =
    buildFrom(s, Tables(s, dir).documents.filter(!isBatch),
      corpusPath(dir), path)

  /** One slice's band-table rows, from its shingle relation — the SAME
    * banding expressions for build and maintained append. */
  private[llm] def bandTableRows(sh: DataFrame): DataFrame =
    Dedup.bandRows(sh)
      .select(col("band"), col("bh"), bb.as("bb"), col("doc_id"))

  /** One slice's shingle-table rows. */
  private[llm] def shingleTableRows(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), db.as("db"), col("sh"))

  /** Build over an explicit corpus (the managed-corpus maintenance path
    * fences on its OWN table; the classic path fences on the testdata
    * parquet). */
  private[graft] def buildFrom(s: SparkSession, corpus: DataFrame,
      fenceCorpus: String, path: String): Unit = synchronized {
    val bandsPath = s"$path/bands"
    val shinglesPath = s"$path/shingles"
    val built = Files.isDirectory(Paths.get(bandsPath)) && {
      val l = Files.list(Paths.get(bandsPath))
      try l.iterator().hasNext finally l.close()
    }
    if (built && staleness(path).contains(false) &&
        IndexFence.readLayout(path) == LayoutVersion) return
    if (built) {
      s.catalog.refreshByPath(fenceCorpus)
      IndexFence.rmTree(Paths.get(bandsPath))
      IndexFence.rmTree(Paths.get(shinglesPath))
      IndexFence.clear(path)
    }
    val fp = IndexFence.fingerprint(fenceCorpus)
    // One shingle pass feeds both tables (the explode+distinct is the
    // expensive part — the same persist point every in-query entry uses).
    val sh = Dedup.shingleRows(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Files.createDirectories(Paths.get(bandsPath))
    ManifestFileSink.setPartitionColumn(bandsPath, "bb")
    bandTableRows(sh)
      .write.format(fmt).option("path", bandsPath).mode("append").save()
    Files.createDirectories(Paths.get(shinglesPath))
    ManifestFileSink.setPartitionColumn(shinglesPath, "db")
    shingleTableRows(sh)
      .write.format(fmt).option("path", shinglesPath).mode("append").save()
    sh.unpersist(blocking = true)
    // Layout tag before the fence; fence LAST stays the commit point.
    IndexFence.writeLayout(path, LayoutVersion)
    IndexFence.write(path, fenceCorpus, fp)
  }

  /** Near-dup matches of an arriving `batch` (docs with `doc_id`,
    * `text`; ids disjoint from the indexed corpus) against the index:
    * exact-Jaccard ≥ 0.8 `(d1 = corpus doc, d2 = new doc, jaccard)`.
    * REFUSES a stale index. Band-bucket pruning pays off in proportion
    * to batch size: a handful of docs probes a handful of buckets, and
    * even a bucket-saturating batch reads only the band table — never
    * the corpus. */
  def serve(s: SparkSession, path: String, batch: DataFrame): DataFrame = {
    staleness(path) match {
      case Some(true) =>
        val corpus = IndexFence.read(path).map(_._1).getOrElse("<unknown>")
        throw new IllegalStateException(
          s"dedup index at $path is STALE: corpus $corpus changed since " +
            "build. Rebuild via DedupIndex.build(spark, dir, path).")
      case _ =>
    }
    val bsh = Dedup.shingleRows(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bBands = Dedup.bandRows(bsh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Probed band buckets, computed with the BUILD's own hash expression
    // over the batch's band keys (bounded: ≤ BandBuckets values).
    val probedBb = bBands.select(bb.as("bb")).distinct()
      .collect().map(_.getLong(0)).sorted
    val corpusBands = s.read.format(fmt).option("path", s"$path/bands").load()
      .filter(col("bb").isin(probedBb: _*))
    // NOT persisted: the verify join re-derives this from the SAME
    // pruned bucket files (the probe list is already collected), so the
    // recompute is one small pruned read + join — and the served plan
    // keeps the `bb IN` scan visible for the pruning audit instead of
    // an opaque cache node (DedupIndexSpec pins filesRead on it).
    val cands = corpusBands.as("x")
      .join(bBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // Candidate corpus docs' shingle buckets (bounded: ≤ DocBuckets).
    val probedDb = cands.select(pmod(col("d1"), lit(DocBuckets.toLong)).as("db"))
      .distinct().collect().map(_.getLong(0)).sorted
    val corpusSh = s.read.format(fmt).option("path", s"$path/shingles").load()
      .filter(col("db").isin(probedDb: _*))
      .select(col("doc_id"), col("sh"))
    // Exact verify over stored corpus shingles ∪ in-query batch shingles
    // (doc_id spaces are disjoint by the split). The pruned bucket read
    // over-fetches non-candidate docs sharing a bucket — their size rows
    // fold and drop at the candidate join; at scale, semi-join the scan
    // on the candidate ids to trim it.
    Dedup.jaccardPairsFromShingles(
        corpusSh.unionByName(bsh), Threshold, Some(cands))
      .orderBy(col("d1"), col("d2"))
  }

  /** Oracle-gated entry: build-once then serve the standard batch. The
    * served pairs are exactly the cross-split exact-Jaccard pairs, so
    * DuckDB replays them from the one documents table while the PLAN
    * probes the persisted band/shingle buckets. LSH recall at the
    * corpus' J ≥ 0.96 duplicate clusters is 1 − (1 − J²)⁸ ≈ 1 − 1e-9
    * and no cross pairs live in (0.5, 0.96), so the exact oracle is the
    * correct reference for the verified-candidate output (the
    * [[Dedup.dedupMinhashLshSql]] argument). */
  def dedupIndexServe: (SparkSession, String) => DataFrame = (s, dir) => {
    val path = indexPath(dir)
    build(s, dir, path)
    serve(s, path, Tables(s, dir).documents.filter(isBatch))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_index_serve" -> dedupIndexServe)

  val oracleSql: Map[String, String] = Map(
    "dedup_index_serve" ->
      """WITH wl AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(wl[x+1:x+3], ' ') AS sh
        |       FROM wl, UNNEST(range(len(wl)-2)) AS t(x)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
        |          FROM sh a JOIN sh b ON a.sh = b.sh
        |          WHERE a.doc_id % 13 <> 5 AND b.doc_id % 13 = 5
        |          GROUP BY 1, 2)
        |SELECT d1, d2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
        |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8
        |ORDER BY d1, d2""".stripMargin)
}
