package graft.llm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ManifestFileSink, Tables}

/** INCREMENTAL maintenance for the VECTOR index — the third leg of the
  * maintenance trilogy ([[IndexMaintenance]] covers the text and dedup
  * indexes; this closes the family): a managed embeddings corpus, one
  * WAP-staged transaction that appends a batch's corpus rows AND its
  * cell assignments, and a serve that equals the frozen-centroid
  * rebuild row-for-row.
  *
  * The IVF-specific contract, and why appends are EXACT here:
  * production IVF never retrains per batch — centroids train over the
  * standing corpus and FREEZE; an arriving vector is assigned to its
  * nearest frozen cell ([[VectorIndex.assignNew]] — the map-only fold,
  * the same score/tie expressions as [[Similarity.kmeansAssign]]).
  * Since assignments are per-vector and the index stores no global
  * statistic, append-then-serve ≡ assign-everything-then-serve with the
  * SAME centroids — no norms-style refold step at all. What appends DO
  * decay is centroid FIT (the training sample drifts from the data);
  * that is [[VectorIndex.assignmentImbalance]]'s job — the maintenance
  * door retrains when imbalance crosses the bar, a deliberate rebuild,
  * never a silent wrong answer.
  *
  * Transaction shape (the [[IndexMaintenance]] discipline, two tables
  * instead of five): stage batch corpus rows + batch assignment rows
  * under one `wap-id`; audit via `VERSION AS OF 'wap:'` (batch vec_ids
  * disjoint from the corpus, each table grew by exactly the batch's
  * computed rows); publish or discard as one decision; fences advance
  * LAST to the corpus table's manifest-chain fingerprint — a refused
  * audit leaves both the chain and the fence untouched (the r16 fence
  * rule), out-of-band corpus writes still read as drift.
  *
  * Entry split: the managed corpus is `vec_id % 13 ≠ 6`, the maintained
  * append is class 6, so the served universe is ALL vectors — and the
  * DuckDB oracle replays it exactly: centroids train over the `eb`
  * (base) CTE, the final assignment runs over full `e`
  * ([[Similarity.kmeansCtes]] parametrized train/assign).
  *
  * At 100 TB: per-batch cost is ONE map pass over the batch (the
  * centroid list is broadcast-sized by construction) plus two bounded
  * appends — no shuffle, no corpus read; the clustered assigned-table
  * write demuxes per-cell files so serve's partition pruning is
  * unchanged after any number of appends. */
object VectorMaintenance {

  private def fmt = classOf[ManifestFileSink].getName

  private val AppendClass = 6
  private val WapId = "vecingest-c6"

  /** Layout v1 = assigned `(vec_id, vnenc, cell)` cell-partitioned +
    * cents `(cent_id, cvenc)` (see [[IndexFence.layoutFile]]). */
  private[llm] val LayoutVersion = 1

  def basePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_vecingest", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  def corpusTable(base: String): String = s"$base/corpus"
  def vecPath(base: String): String = s"$base/index"

  /** The manifest sink stores scalar columns only, so the managed
    * corpus keeps embeddings through the SAME exact string codec the
    * index tables use ([[VectorIndex.enc]]/[[VectorIndex.dec]] — a
    * bit-exact double roundtrip, proven by every serve oracle). */
  private def encodeRows(raw: DataFrame): DataFrame =
    raw.select(col("vec_id"),
      VectorIndex.enc(transform(col("embedding"), _.cast("double"))).as("embenc"))

  private def readCorpus(s: SparkSession, base: String): DataFrame =
    s.read.format(fmt).option("path", corpusTable(base)).load()

  private def readCorpusEmb(s: SparkSession, base: String): DataFrame =
    readCorpus(s, base)
      .select(col("vec_id"), VectorIndex.dec(col("embenc")).as("embedding"))

  /** Build the managed embeddings corpus + the frozen-centroid index
    * when absent, stale, or layout-mismatched. Idempotent: a fresh
    * fence + current layout no-ops. */
  def ensureBase(s: SparkSession, dir: String): String = synchronized {
    val base = basePath(dir)
    val ct = corpusTable(base)
    val ip = vecPath(base)
    val corpusExists = Files.isDirectory(Paths.get(ct)) && {
      val l = Files.list(Paths.get(ct))
      try l.iterator().hasNext finally l.close()
    }
    if (!corpusExists) {
      IndexFence.rmTree(Paths.get(base))
      Files.createDirectories(Paths.get(ct))
      encodeRows(Tables(s, dir).embeddings
          .filter(col("vec_id") % 13 =!= AppendClass))
        .write.format(fmt).option("path", ct).mode("append").save()
    }
    s.catalog.refreshByPath(ct)
    val assignedPath = s"$ip/assigned"
    val centsPath = s"$ip/cents"
    val built = Files.isDirectory(Paths.get(assignedPath)) && {
      val l = Files.list(Paths.get(assignedPath))
      try l.iterator().hasNext finally l.close()
    }
    if (built && IndexFence.staleness(ip).contains(false) &&
        IndexFence.readLayout(ip) == LayoutVersion) return base
    if (built) {
      IndexFence.rmTree(Paths.get(assignedPath))
      IndexFence.rmTree(Paths.get(centsPath))
      IndexFence.clear(ip)
    }
    val fp = IndexFence.fingerprint(ct)
    val emb = Similarity.normalizedDf(readCorpusEmb(s, base))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = Similarity.kmeansCentroids(emb)
    val assigned = Similarity.kmeansAssign(emb, cents)
    Files.createDirectories(Paths.get(assignedPath))
    ManifestFileSink.setPartitionColumn(assignedPath, "cell")
    assigned
      .select(col("vec_id"), VectorIndex.enc(col("vn")).as("vnenc"), col("cell"))
      .write.format(fmt).option("path", assignedPath).mode("append").save()
    cents.select(col("cent_id"), VectorIndex.enc(col("cv")).as("cvenc"))
      .coalesce(1)
      .write.format(fmt).option("path", centsPath).mode("append").save()
    emb.unpersist(blocking = true)
    // Layout tag before the fence; fence LAST stays the commit point.
    IndexFence.writeLayout(ip, LayoutVersion)
    IndexFence.write(ip, ct, fp)
    base
  }

  /** Has the standard append batch already been ingested? */
  def batchApplied(s: SparkSession, base: String): Boolean =
    !readCorpus(s, base)
      .filter(col("vec_id") % 13 === AppendClass)
      .limit(1).isEmpty

  /** The two-table ingest transaction: stage → audit → publish/discard
    * → fence advance. `batch` carries raw (vec_id, embedding) rows. */
  def ingestAppend(s: SparkSession, base: String, batch: DataFrame): Unit =
    synchronized {
      val ct = corpusTable(base)
      val ip = vecPath(base)
      for (st <- IndexFence.staleness(ip))
        if (st) throw new IllegalStateException(
          s"vector index at $ip is STALE (out-of-band corpus drift): " +
            "rebuild before maintaining.")
      val assignedT = s"$ip/assigned"
      val allTables = Seq(ct, assignedT)
      val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Frozen-centroid assignment: one map pass, no shuffle.
      val bAssigned = VectorIndex.assignNew(s, ip, b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def stage(df: DataFrame, path: String): Unit =
        df.write.format(fmt).option("path", path).option("wap-id", WapId)
          .mode("append").save()
      def wapView(path: String): DataFrame =
        s.read.format(fmt).option("path", path)
          .option("asOfManifest", s"wap:$WapId").load()
      def mainCount(path: String): Long =
        s.read.format(fmt).option("path", path).load().count()
      try {
        val pre = allTables.map(p => p -> mainCount(p)).toMap
        stage(encodeRows(b), ct)
        stage(bAssigned, assignedT)
        // AUDIT 1: batch vec_ids are NEW (per-vector rows are exact
        // under appends ONLY because ids never replay).
        val collisions = readCorpus(s, base).join(
          b.select(col("vec_id")), Seq("vec_id"), "left_semi").count()
        if (collisions > 0) throw new IllegalStateException(
          s"ingest audit failed: $collisions batch vec_ids already in " +
            "the corpus — appends must be new vectors")
        // AUDIT 2: exact growth per table.
        val expected = Map(ct -> b.count(), assignedT -> bAssigned.count())
        for (p <- allTables) {
          val grew = wapView(p).count() - pre(p)
          if (grew != expected(p)) throw new IllegalStateException(
            s"ingest audit failed: $p staged $grew rows, expected ${expected(p)}")
        }
        allTables.foreach(p => ManifestFileSink.wapPublish(p, WapId))
      } catch {
        case e: Throwable =>
          allTables.foreach { p =>
            try ManifestFileSink.wapDiscard(p, WapId)
            catch { case _: Throwable => () }
          }
          b.unpersist(); bAssigned.unpersist()
          throw e
      }
      // Fence advances LAST to the corpus chain's new state.
      s.catalog.refreshByPath(ct)
      IndexFence.write(ip, ct, IndexFence.fingerprint(ct))
      b.unpersist(); bAssigned.unpersist()
    }

  /** Oracle-gated: nprobe=1 serve from the MAINTAINED vector index —
    * base trained + frozen, class-6 appended, so the served universe is
    * ALL vectors while the centroids are the base's. DuckDB replays it
    * with train=eb / assign=e (the [[Similarity.kmeansCtes]] split). */
  def vecIndexAppend: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = ensureBase(s, dir)
    if (!batchApplied(s, base)) {
      ingestAppend(s, base,
        Tables(s, dir).embeddings.filter(col("vec_id") % 13 === AppendClass))
      s.catalog.refreshByPath(corpusTable(base))
    }
    VectorIndex.serve(s, vecPath(base), nprobe = 1)
  }

  val vecIndexAppendSql: String =
    s"""WITH ${Similarity.normalizedSql},
       |eb AS (SELECT * FROM e WHERE vec_id % 13 <> 6),
       |${Similarity.kmeansCtes("eb", "e")},
       |p AS (SELECT vec_id AS query_id, vn AS qv, cell FROM af WHERE vec_id < 10)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ROUND(list_dot_product(p.qv, a.vn), 9) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY list_dot_product(p.qv, a.vn) DESC, a.vec_id) AS rank
       |  FROM p JOIN af a ON p.cell = a.cell AND a.vec_id <> p.query_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_index_append" -> vecIndexAppend)

  val oracleSql: Map[String, String] = Map(
    "vec_index_append" -> vecIndexAppendSql)
}
