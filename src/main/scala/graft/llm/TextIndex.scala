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
  * relation `(tok, tb, doc_id, dl, tf, df)` — tf per (doc, term), doc
  * length riding the grouping key, df DENORMALIZED onto every posting
  * row (the standard immutable-index trade: ~8 bytes/row buys serving
  * with zero term-stats join) — written as a manifest table
  * `PARTITIONED BY (tb)` where `tb = pmod(xxhash64(tok), Buckets)` is
  * a precomputed TERM BUCKET column: the clustered write demuxes one
  * data file per bucket, each file's bucket proven by its zone map.
  * A one-row corpus-stats table (n_docs, sum_dl) sits beside it.
  * Terms hash ~uniformly across buckets, so bucket files stay balanced
  * no matter how Zipf the term distribution of any ONE document is.
  *
  * SERVE ([[serve]]): hash the query's terms to their buckets (one
  * tiny Spark job — the SAME xxhash64 expression the build used, so
  * driver and data can never disagree), read the postings table with a
  * static `tb IN (probed)` + `tok IN (terms)` filter — the sink's
  * partition pruning opens ONLY the probed buckets' files
  * (TextIndexSpec pins filesRead + filesPruned == bucket files, read <
  * all) — and score Robertson–Walker BM25 (k1=1.2, b=0.75, rational
  * RSJ idf) from the STORED tf/df/dl. The arithmetic is
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

  private def fmt = classOf[ManifestFileSink].getName

  def indexPath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_textindex", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  private def corpusPath(dir: String): String = s"$dir/documents.parquet"

  /** None = no/pre-fence index; Some(true) = corpus drifted since build. */
  def staleness(path: String): Option[Boolean] = IndexFence.staleness(path)

  private def tb(tok: org.apache.spark.sql.Column) =
    pmod(xxhash64(tok), lit(Buckets.toLong))

  /** Tokenize + fold + write. No-op when already built and provably
    * fresh; a drifted or pre-fence index rebuilds from scratch. */
  def build(s: SparkSession, dir: String, path: String): Unit = synchronized {
    val postingsPath = s"$path/postings"
    val statsPath = s"$path/stats"
    val built = Files.isDirectory(Paths.get(postingsPath)) && {
      val l = Files.list(Paths.get(postingsPath))
      try l.iterator().hasNext finally l.close()
    }
    if (built && staleness(path).contains(false)) return
    if (built) {
      s.catalog.refreshByPath(corpusPath(dir))
      IndexFence.rmTree(Paths.get(postingsPath))
      IndexFence.rmTree(Paths.get(statsPath))
      IndexFence.clear(path)
    }
    val fp = IndexFence.fingerprint(corpusPath(dir))
    val d = Tables(s, dir).documents
    val tf = d
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumnRenamed("tok", "df_tok")
    Files.createDirectories(Paths.get(postingsPath))
    ManifestFileSink.setPartitionColumn(postingsPath, "tb")
    // df join shuffles at the term grain (bounded by vocabulary); the
    // posting write then demuxes one attested file per term bucket.
    tf.join(df, col("tok") === col("df_tok"))
      .select(col("tok"), tb(col("tok")).as("tb"), col("doc_id"),
        col("dl"), col("tf"), col("df"))
      .write.format(fmt).option("path", postingsPath).mode("append").save()
    tf.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .coalesce(1)
      .write.format(fmt).option("path", statsPath).mode("append").save()
    tf.unpersist(blocking = true)
    // Fence LAST: a crash mid-build reads as pre-fence and rebuilds.
    IndexFence.write(path, corpusPath(dir), fp)
  }

  /** BM25 top-20 for `terms` from the persisted index. REFUSES a stale
    * index (the wrong-answer class the fence exists for). */
  def serve(s: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    staleness(path) match {
      case Some(true) =>
        val corpus = IndexFence.read(path).map(_._1).getOrElse("<unknown>")
        throw new IllegalStateException(
          s"text index at $path is STALE: corpus $corpus changed since " +
            "build. Rebuild via TextIndex.build(spark, dir, path).")
      case _ =>
    }
    // The probed buckets, computed with the BUILD's own hash expression
    // (one |terms|-row job — a driver-side reimplementation of xxhash64
    // could silently disagree seed-for-seed; this cannot).
    import scala.jdk.CollectionConverters._
    val buckets = s.createDataset(terms.asJava)(
        org.apache.spark.sql.Encoders.STRING)
      .select(tb(col("value")).as("tb")).distinct()
      .collect().map(_.getLong(0)).sorted
    val postings = s.read.format(fmt).option("path", s"$path/postings").load()
      .filter(col("tb").isin(buckets: _*) && col("tok").isin(terms: _*))
    val stats = s.read.format(fmt).option("path", s"$path/stats").load()
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_index_serve" -> textIndexServe)

  val oracleSql: Map[String, String] = Map(
    "text_index_serve" -> TextAnalysis.bm25Sql)
}
