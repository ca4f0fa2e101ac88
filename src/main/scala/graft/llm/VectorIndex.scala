package graft.llm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotp
import graft.plans.TopKPerGroup
import graft.sources.{ManifestFileSink, Tables}

/** PERSISTED IVF vector index, served by partition-pruned scans — the
  * composition the in-query ANN certifiers point at: every `knn_ivf*`
  * entry trains its index inside the query (the right shape for a
  * self-contained oracle), but a production index is built ONCE and
  * then every query pays only its probed cells. This module makes that
  * real with the engine's own table format:
  *
  * BUILD ([[build]]): train k-means ([[Similarity.kmeansCentroids]]),
  * assign the corpus, and write TWO manifest tables — the assignment
  * relation `(vec_id, vnenc, cell)` declared `PARTITIONED BY (cell)`
  * (the identity storage-partitioned layout: the clustered write demuxes
  * ONE data file per cell, each file's cell proven by its zone map), and
  * the tiny centroid relation `(cent_id, cvenc)`. Vectors ride as
  * comma-joined `Double.toString` strings — Java's shortest-roundtrip
  * rendering parses back bit-exact, so the served scores are IDENTICAL
  * to the in-query index's.
  *
  * SERVE ([[serve]]): load the centroids (broadcast-sized), pick each
  * query's nprobe nearest cells with the bounded heap, then read the
  * assignment TABLE with a static `cell IN (probed)` filter — the sink's
  * exact partition-filter pruning opens ONLY the probed cells' files
  * (VectorIndexSpec pins filesRead == probed cells). The probed cell
  * ids are collected to the driver first: a (queries × nprobe) set of
  * ints — bounded by the query sample, never by the corpus — exactly
  * the two-phase probe-then-fetch shape every vector store serves with.
  * At 100 TB the index table is the big artifact; a query touches
  * nprobe files of it and the centroid table, nothing else.
  *
  * Reference anchor: engine capability beyond the reference's sink
  * (SURVEY.md §2 north-star extensions); the layout is SURVEY §2.6's
  * storage-partitioned join machinery applied to ANN serving.
  */
object VectorIndex {

  private[llm] def enc(col0: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(transform(col0, x => x.cast("string")), ",")

  private[llm] def dec(col0: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(split(col0, ","), x => x.cast("double"))

  private def fmt = classOf[ManifestFileSink].getName

  /** Deterministic per-corpus index location (test/bench runs reuse it;
    * the build is idempotent-by-existence). */
  def indexPath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_vecindex", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** The corpus relation the index is built over — the staleness fence
    * fingerprints exactly this path. */
  private def corpusPath(dir: String): String = s"$dir/embeddings.parquet"

  private def fenceFile(path: String) = Paths.get(path, "corpus.fp")

  /** Fingerprint recorded at build: `corpusPath|fp` via the MV-rewrite
    * fence discipline ([[graft.plans.MaterializedRollupRewrite
    * .fenceFingerprint]] — file names + mtimes + lengths, one metadata
    * listing, no data read). A recorded 0 means the fence was dark at
    * build time (unreachable corpus) and staleness is the caller's. */
  private def readFence(path: String): Option[(String, Long)] = {
    val f = fenceFile(path)
    if (!Files.isRegularFile(f)) None
    else {
      val line = new String(Files.readAllBytes(f), "UTF-8").trim
      val cut = line.lastIndexOf('|')
      if (cut < 0) None else Some((line.substring(0, cut), line.substring(cut + 1).toLong))
    }
  }

  /** Is the persisted index at `path` stale for the corpus it recorded?
    * None = no index or a pre-fence index (can't prove freshness);
    * Some(false) = provably fresh or fence dark-by-record;
    * Some(true) = corpus drifted since build. Metadata-only — zero data
    * IO on the fresh path. */
  def staleness(path: String): Option[Boolean] = readFence(path).map {
    case (corpus, fp) =>
      fp != 0L && graft.plans.MaterializedRollupRewrite.fenceFingerprint(corpus) != fp
  }

  /** Train + write the index tables. No-op if already built AND the
    * recorded corpus fingerprint still matches ([[staleness]]); a
    * drifted or pre-fence index is REBUILT in place — the same failure
    * class the MV rewrite fences (serving stale cells silently), closed
    * the same way. */
  def build(s: SparkSession, dir: String, path: String): Unit = synchronized {
    val assignedPath = s"$path/assigned"
    val centsPath = s"$path/cents"
    val built = Files.isDirectory(Paths.get(assignedPath)) && {
      val l = Files.list(Paths.get(assignedPath))
      try l.iterator().hasNext finally l.close()
    }
    if (built && staleness(path).contains(false)) return
    if (built) { // drifted or pre-fence: rebuild from scratch
      // Invalidate cached plans whose lineage reads the corpus before
      // retraining. Plain `spark.read.parquet` gets a fresh FileIndex
      // per read, so V1-path rebuilds happen to retrain clean anyway —
      // but the training kernels persist Lloyd-iteration centroids for
      // cross-query reuse (Similarity.kmeansCentroids), and any caller
      // that reaches the corpus through a catalog table or a reused
      // DataFrame WOULD be handed the old corpus's cached centroids
      // here. One metadata call buys immunity to that plan-identity
      // subtlety.
      s.catalog.refreshByPath(corpusPath(dir))
      def rm(p: java.nio.file.Path): Unit =
        if (Files.exists(p)) {
          val st = Files.walk(p)
          try st.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => Files.delete(q))
          finally st.close()
        }
      rm(Paths.get(assignedPath)); rm(Paths.get(centsPath))
      Files.deleteIfExists(fenceFile(path))
    }
    val fp = graft.plans.MaterializedRollupRewrite.fenceFingerprint(corpusPath(dir))
    val emb = Similarity.normalized(Tables(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = Similarity.kmeansCentroids(emb)
    val assigned = Similarity.kmeansAssign(emb, cents)
    Files.createDirectories(Paths.get(assignedPath))
    ManifestFileSink.setPartitionColumn(assignedPath, "cell")
    assigned.select(col("vec_id"), enc(col("vn")).as("vnenc"), col("cell"))
      .write.format(fmt).option("path", assignedPath).mode("append").save()
    cents.select(col("cent_id"), enc(col("cv")).as("cvenc"))
      .coalesce(1)
      .write.format(fmt).option("path", centsPath).mode("append").save()
    // The build's own working set does not outlive the build: unlike
    // the in-query certifiers (whose session-long persists are a
    // deliberate cross-query reuse over immutable testdata), a leaked
    // build-side cache entry is storage held for a table that now
    // exists on disk.
    emb.unpersist(blocking = true)
    // Fence LAST: a crash mid-build leaves no fence file, so the next
    // build sees "pre-fence" and rebuilds rather than trusting a torn
    // index.
    Files.write(fenceFile(path),
      s"${corpusPath(dir)}|$fp".getBytes("UTF-8"))
  }

  /** Top-3 neighbors for the standard query sample (vec_id < 10) from
    * the PERSISTED index at `path`, probing `nprobe` cells per query.
    *
    * REFUSES (IllegalStateException) if the recorded corpus fingerprint
    * no longer matches the corpus — a stale index silently returns
    * neighbors from a world that no longer exists, the wrong-answer
    * class the fence exists for. The check is one metadata listing of
    * the corpus dir; the data-read path is unchanged (still exactly the
    * probed cells' files). */
  def serve(s: SparkSession, path: String, nprobe: Int): DataFrame = {
    staleness(path) match {
      case Some(true) =>
        val corpus = readFence(path).map(_._1).getOrElse("<unknown>")
        throw new IllegalStateException(
          s"vector index at $path is STALE: corpus $corpus changed since " +
            "build. Rebuild via VectorIndex.build(spark, dir, path) — " +
            "build detects the drift and reconstructs in place.")
      case _ => // fresh, fence-dark-by-record, or pre-fence legacy: serve
    }
    val cents = s.read.format(fmt).option("path", s"$path/cents").load()
      .select(col("cent_id"), dec(col("cvenc")).as("cv"))
    val index = s.read.format(fmt).option("path", s"$path/assigned").load()
    val queries = index.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), dec(col("vnenc")).as("qv"))
    val probeScores = queries.join(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cent_id"),
        (dotp(col("qv"), col("cv")) /
          sqrt(dotp(col("cv"), col("cv")))).as("cs"))
    val probes =
      TopKPerGroup(probeScores, Seq("query_id"), Seq(("cs", false), ("cent_id", true)), nprobe)
        .select(col("query_id"), col("qv"), col("cent_id").as("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Phase 1 → 2 boundary: the probed cell ids come to the driver —
    // (queries × nprobe) ints, bounded by the query sample — and return
    // as a STATIC IN filter, which the sink's partition-filter pruning
    // answers at plan time (only the probed cells' files are opened).
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val cand = index.filter(col("cell").isin(cells: _*))
      .select(col("vec_id"), dec(col("vnenc")).as("vn"), col("cell"))
    val scored = broadcast(probes).join(cand, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dotp(col("qv"), col("vn")).as("cos"))
    Similarity.topKRanked(scored, 3)
  }

  // ------------------------------------------------- incremental ingest

  /** Streaming-safe cell assignment for NEW vectors against the
    * persisted (FROZEN) centroids: the centroid table is collected
    * driver-side (broadcast-sized by construction — it IS the thing
    * serve() broadcasts) into a literal array, and the argmin is a
    * per-row `aggregate` fold over it — a pure MAP with no shuffle and
    * no stream-side aggregation, so the same expression runs over a
    * batch DataFrame or a `readStream` in append mode, and at 100 TB
    * ingestion parallelizes embarrassingly. The scoring expression is
    * [[Similarity.kmeansAssign]]'s verbatim (dot / ‖cv‖, ties to the
    * lowest cent_id), so a vector lands in the same cell either way.
    * Input: (vec_id, embedding); output: the assignment-table row shape
    * (vec_id, vnenc, cell) ready for
    * `writeStream.format(manifest).option("path", s"$path/assigned")` —
    * the epoch-fenced streaming write demuxes one ATTESTED file per
    * touched cell per epoch (the round-12 machinery), and serve() picks
    * the new vectors up on its next plan with NO rebuild. */
  def assignNew(s: SparkSession, path: String, vectors: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate => ffold}
    val cents: Seq[(Long, Seq[Double])] =
      s.read.format(fmt).option("path", s"$path/cents").load()
        .select(col("cent_id"), dec(col("cvenc")).as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq
    require(cents.nonEmpty, s"no centroid table at $path/cents — build first")
    val centsLit = typedlit(cents)
    val v = transform(col("embedding"), _.cast("double"))
    val vn = vectors
      .select(col("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(dotp(col("v"), col("v"))))
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("vn"))
    val best = ffold(
      centsLit,
      struct(lit(Double.NegativeInfinity).as("cs"), lit(Long.MaxValue).as("cell")),
      (acc, c) => {
        val cs = dotp(col("vn"), c.getField("_2")) /
          sqrt(dotp(c.getField("_2"), c.getField("_2")))
        when(cs > acc.getField("cs") ||
            (cs === acc.getField("cs") && c.getField("_1") < acc.getField("cell")),
          struct(cs.as("cs"), c.getField("_1").as("cell")))
          .otherwise(acc)
      })
    vn.select(col("vec_id"), enc(col("vn")).as("vnenc"),
      best.getField("cell").as("cell"))
  }

  /** Re-record the corpus fingerprint after an ingestion pipeline has
    * advanced corpus and index IN LOCKSTEP — the streaming-append
    * contract: the pipeline that writes both is the only party that can
    * assert they agree, exactly as build() is for the initial load. */
  def refreshFence(path: String, dir: String): Unit = {
    require(Files.isDirectory(Paths.get(s"$path/assigned")),
      s"no index at $path — nothing to re-fence")
    val fp = graft.plans.MaterializedRollupRewrite.fenceFingerprint(corpusPath(dir))
    Files.write(fenceFile(path), s"${corpusPath(dir)}|$fp".getBytes("UTF-8"))
  }

  /** Max/mean live-row imbalance across cells, answered from manifest
    * METADATA only ([[ManifestFileSink.partitionRowCounts]] — no data
    * file opened). 1.0 = perfectly balanced. PositiveInfinity when any
    * file cannot prove its cell (unprovable residue reads as maximal
    * drift — conservative). Ingestion against frozen centroids is what
    * makes this grow: the distribution drifts away from the training
    * sample and piles into few cells, degrading both recall and the
    * probe cost model. */
  def assignmentImbalance(path: String): Double = {
    val loads = ManifestFileSink.partitionRowCounts(s"$path/assigned")
    if (loads.isEmpty) 0.0
    else if (loads.contains(None)) Double.PositiveInfinity
    else {
      val vs = loads.values.map(_.toDouble)
      val mean = vs.sum / vs.size
      if (mean == 0.0) 0.0 else vs.max / mean
    }
  }

  /** Force a from-scratch rebuild (retrain + rewrite + re-fence),
    * regardless of the current fence. */
  def rebuild(s: SparkSession, dir: String, path: String): Unit = synchronized {
    Files.deleteIfExists(fenceFile(path)) // pre-fence ⇒ build rebuilds
    build(s, dir, path)
  }

  /** The maintenance door that closes the incremental-ingest loop:
    * rebuild when the fence says the corpus drifted OUTSIDE the
    * ingestion pipeline, or when ingestion itself skewed the assignment
    * past `maxImbalance` (frozen centroids no longer fit the data —
    * re-fencing would be a lie, the index needs RETRAINING). Returns
    * true iff a rebuild ran. */
  def maintain(s: SparkSession, dir: String, path: String,
      maxImbalance: Double = 4.0): Boolean = {
    val stale = staleness(path).getOrElse(true)
    if (!stale && assignmentImbalance(path) <= maxImbalance) false
    else { rebuild(s, dir, path); true }
  }

  /** Oracle-gated entry: build-once then serve nprobe=1 — the results
    * are bit-identical to [[Similarity.knnIvfTrained]] (same training,
    * same metric; the string roundtrip is exact), so the same DuckDB
    * oracle replays it while the PLAN reads the persisted table with
    * partition pruning instead of re-training. */
  def knnIndexServe: (SparkSession, String) => DataFrame = (s, dir) => {
    val path = indexPath(dir)
    build(s, dir, path)
    serve(s, path, nprobe = 1)
  }

  /** nprobe=2 over the same persisted index — the candidate fetch opens
    * TWO cells' files per query instead of one (same partition-pruned
    * scan, same [[Similarity.knnIvfTrainedMultiprobe]] results and
    * oracle). */
  def knnIndexServeMultiprobe: (SparkSession, String) => DataFrame = (s, dir) => {
    val path = indexPath(dir)
    build(s, dir, path)
    serve(s, path, nprobe = 2)
  }
}
