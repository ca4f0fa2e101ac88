package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.IndexMaintenance
import graft.sources.{ManifestFileSink, Tables}

/** STREAMING curated admission — [[StreamingIngest]] delivers epochs,
  * this gates them: each micro-batch runs the full production admission
  * chain ([[graft.llm.IndexMaintenance.curateEpoch]] — near-dup reject
  * against the persisted dedup index, within-epoch keep-first dedup,
  * quality gate) and only the ADMITTED documents append through the
  * index transaction, with the epoch's decision recorded in a ledger
  * row published atomically with its effects.
  *
  * What this adds over the ungated stream: SEQUENTIAL dependence.
  * Epoch k+1's corpus probe sees base ∪ admitted(≤k) — a document
  * arriving in epoch 1 that near-duplicates an epoch-0 ADMIT is
  * rejected, while one duplicating an epoch-0 REJECT is not (the
  * reject never entered the corpus). The oracle replays exactly that
  * by unrolling the two epochs as chained CTEs — the deterministic
  * epoch split (`(doc_id div 13) % 2` over class 6) is what makes the
  * boundary SQL-expressible; the epoch files are written in that split
  * with forced ascending mtimes so the file source's (mtime, path)
  * ordering delivers them in oracle order.
  *
  * Exactly-once under replay: the ledger decides (content cannot — a
  * gated epoch's rejects leave no corpus trace, so "all ids present"
  * is undecidable from data alone, unlike the plain append); torn
  * stages discard under the epoch's own `wap-id`; the manifest-chain
  * fence fingerprint keeps every refusal/discard invisible to the
  * staleness fences.
  *
  * At 100 TB: per-epoch cost = the [[IndexMaintenance]] append bound
  * plus the gate — a pruned band-bucket probe of the batch (never a
  * corpus scan) and an O(batch²-candidate) within-epoch verify that
  * LSH banding bounds; the admission ledger is one row per epoch. */
object CurationStream {

  private val AppendClass = 6

  private def fmt = classOf[ManifestFileSink].getName

  def basePath(dir: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_curation_stream", dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Stage the class-6 arrivals as TWO epoch files split by
    * `(doc_id div 13) % 2` — deterministic content AND deterministic
    * delivery order (ascending forced mtimes; the `.ready` marker gates
    * a torn write, and dot-files are invisible to the file source). */
  private[streaming] def ensureEpochFiles(s: SparkSession, dir: String,
      base: String): String = {
    val ep = s"$base/epochs"
    val ready = Paths.get(ep, ".ready")
    if (!Files.isRegularFile(ready)) {
      graft.llm.IndexFence.rmTree(Paths.get(ep))
      Files.createDirectories(Paths.get(ep))
      val now = System.currentTimeMillis()
      for (k <- 0 to 1) {
        val tmp = Files.createTempDirectory("graft-curation-epoch").toString
        Tables(s, dir).documents
          .filter(col("doc_id") % 13 === AppendClass &&
            expr(s"(doc_id div 13) % 2 = $k"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = Paths.get(ep, f"e$k%03d.parquet")
        Files.move(part.toPath, dest)
        Files.setLastModifiedTime(dest,
          FileTime.fromMillis(now - (2 - k) * 2000L))
        graft.llm.IndexFence.rmTree(Paths.get(tmp))
      }
      Files.write(ready, Array.emptyByteArray)
    }
    ep
  }

  /** Drain the arrival backlog through the gated per-epoch transaction.
    * Returns the number of epochs DECIDED in this run (0 on a
    * caught-up restart). */
  def runIngest(s: SparkSession, dir: String, base: String): Long = {
    val ep = ensureEpochFiles(s, dir, base)
    val decided = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream
      .schema(s.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (IndexMaintenance.curateEpoch(s, base, batch, epochId))
          decided.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    decided.get()
  }

  /** Oracle-gated: the admitted class-6 membership after both gated
    * epochs — the DuckDB oracle unrolls the two sequential admission
    * rounds over the one documents table. */
  def curationIngestStream: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = IndexMaintenance.ensureBaseAt(s, dir, basePath(dir))
    runIngest(s, dir, base)
    s.read.format(fmt)
      .option("path", IndexMaintenance.corpusTable(base)).load()
      .filter(col("doc_id") % 13 === AppendClass)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Two chained admission rounds, each: corpus near-dup reject (exact
    * Jaccard ≥ 0.8 vs base ∪ earlier admits), within-epoch keep-first,
    * quality gate — [[graft.llm.Curation.curationIngestSql]]'s chain
    * unrolled per epoch. Shared CTE body: the membership entry and the
    * ledger report project different finals over the same replay. */
  private val gateCtes: String = {
    val stops = "(len(list_filter(w.wl, x -> x = 'the')) " +
      "+ len(list_filter(w.wl, x -> x = 'a')))"
    s"""wl AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(wl[x+1:x+3], ' ') AS sh
       |       FROM wl, UNNEST(range(len(wl)-2)) AS t(x)),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |jac AS (
       |  SELECT p.d1, p.d2 FROM (
       |    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
       |    GROUP BY 1, 2) p
       |  JOIN sz s1 ON p.d1 = s1.doc_id JOIN sz s2 ON p.d2 = s2.doc_id
       |  WHERE CAST(p.i AS DOUBLE) / (s1.n + s2.n - p.i) >= 0.8),
       |qual AS (
       |  SELECT d.doc_id FROM documents d JOIN wl w USING (doc_id)
       |  WHERE (1000000 * (len(w.wl) - $stops)) // d.n_chars > 171215),
       |base0 AS (SELECT doc_id FROM documents WHERE doc_id % 13 NOT IN (5, 6)),
       |e0 AS (SELECT doc_id FROM documents
       |       WHERE doc_id % 13 = 6 AND (doc_id // 13) % 2 = 0),
       |e1 AS (SELECT doc_id FROM documents
       |       WHERE doc_id % 13 = 6 AND (doc_id // 13) % 2 = 1),
       |drop0 AS (
       |  SELECT DISTINCT j.d2 AS doc_id FROM jac j
       |  WHERE j.d2 IN (SELECT doc_id FROM e0)
       |    AND (j.d1 IN (SELECT doc_id FROM base0)
       |      OR (j.d1 IN (SELECT doc_id FROM e0) AND j.d1 < j.d2))),
       |adm0 AS (
       |  SELECT doc_id FROM e0
       |  WHERE doc_id IN (SELECT doc_id FROM qual)
       |    AND doc_id NOT IN (SELECT doc_id FROM drop0)),
       |c1 AS (SELECT doc_id FROM base0 UNION SELECT doc_id FROM adm0),
       |drop1 AS (
       |  SELECT DISTINCT j.d2 AS doc_id FROM jac j
       |  WHERE j.d2 IN (SELECT doc_id FROM e1)
       |    AND (j.d1 IN (SELECT doc_id FROM c1)
       |      OR (j.d1 IN (SELECT doc_id FROM e1) AND j.d1 < j.d2))),
       |adm1 AS (
       |  SELECT doc_id FROM e1
       |  WHERE doc_id IN (SELECT doc_id FROM qual)
       |    AND doc_id NOT IN (SELECT doc_id FROM drop1))""".stripMargin
  }

  val curationIngestStreamSql: String =
    s"""WITH $gateCtes
       |SELECT d.doc_id, d.source FROM documents d
       |WHERE d.doc_id IN (SELECT doc_id FROM adm0 UNION SELECT doc_id FROM adm1)
       |ORDER BY d.doc_id""".stripMargin

  /** Oracle-gated: the admission LEDGER itself — one row per decided
    * epoch with its admitted/rejected counts, the observability surface
    * a production ingest monitors (admission-rate drop = upstream
    * duplication or quality regression). The ledger is written inside
    * each epoch's transaction ([[graft.llm.IndexMaintenance
    * .curateEpoch]]), so this entry also gates that the recorded
    * decisions equal the oracle's replayed gate outcomes — a ledger row
    * that disagrees with the admitted membership is a hash miss.
    *
    * At 100 TB: the report reads one metadata-grain table (one row per
    * epoch, never per document). */
  def curationLedgerReport: (SparkSession, String) => DataFrame = (s, dir) => {
    val base = IndexMaintenance.ensureBaseAt(s, dir, basePath(dir))
    runIngest(s, dir, base)
    s.read.format(fmt)
      .option("path", IndexMaintenance.ledgerTable(base)).load()
      .select(col("epoch"), col("admitted"), col("rejected"))
      .orderBy(col("epoch"))
  }

  val curationLedgerReportSql: String =
    s"""WITH $gateCtes
       |SELECT CAST(0 AS BIGINT) AS epoch,
       |  (SELECT COUNT(*) FROM adm0) AS admitted,
       |  (SELECT COUNT(*) FROM e0) - (SELECT COUNT(*) FROM adm0) AS rejected
       |UNION ALL
       |SELECT CAST(1 AS BIGINT),
       |  (SELECT COUNT(*) FROM adm1),
       |  (SELECT COUNT(*) FROM e1) - (SELECT COUNT(*) FROM adm1)
       |ORDER BY epoch""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_ingest_stream" -> curationIngestStream,
    "curation_ledger_report" -> curationLedgerReport)

  val oracleSql: Map[String, String] = Map(
    "curation_ingest_stream" -> curationIngestStreamSql,
    "curation_ledger_report" -> curationLedgerReportSql)
}
