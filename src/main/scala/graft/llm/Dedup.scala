package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextHash._

/** Deduplication operators over the `documents` table: exact, exact
  * n-gram Jaccard, MinHash+LSH, SimHash, and positional fingerprinting.
  *
  * Scale design (the point of each op at 100 TB):
  *   - exact: one hash-shuffle on the full text — Spark's groupBy computes
  *     partial aggregates map-side; no text ever collects to the driver.
  *   - n-gram Jaccard: shingle inverted index + self-equi-join on shingle.
  *     This is the exact-verification kernel; on skewed corpora you first
  *     drop stop-shingles (document frequency cap) — kept exact here to
  *     match the oracle.
  *   - MinHash+LSH: explode→hash→min is a map-side-combinable aggregation
  *     (16 mins per doc); banding (b=8, r=2) turns candidate generation
  *     into an equi-join on (band, bandhash) — O(n·b) shuffle rows instead
  *     of O(n²) comparisons. Candidates are then verified with the exact
  *     Jaccard kernel, so output quality is exact; LSH only bounds recall
  *     (≥ 1 - (1-J²)^8, ≈ 1-1e-9 at the J≥0.96 pairs present in the data).
  *   - SimHash: 32-bit signatures from word-frequency bit votes; pairs via
  *     4×8-bit band pigeonhole (guarantees recall for hamming ≤ 3).
  *   - fingerprint: order-sensitive positional rolling hash — cheap
  *     content-identity for multisets the exact-dup hash would miss.
  *
  * All hashing is [[TextHash]] portable arithmetic so DuckDB oracles can
  * recompute signatures; swap in `xxhash64` for production throughput.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** (doc_id, sh) — distinct word-3-gram shingles per doc. Only the joined
    * shingle string crosses the distinct's shuffle: the three words are
    * recoverable by splitting (words contain no spaces), so carrying them
    * as separate columns would triple the shuffle payload for nothing. */
  private[graft] def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("wl"))
      .filter(size(col("wl")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(wl)-3), i -> concat_ws(' ', wl[i], wl[i+1], wl[i+2]))")).as("sh"))
      .distinct()

  /** SQL for the same distinct shingle set (DuckDB). */
  private[llm] val shingleSql: String =
    """wl AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(wl[x+1:x+3], ' ') AS sh
      |       FROM wl, UNNEST(range(len(wl)-2)) AS t(x))""".stripMargin

  /** Exact Jaccard ≥ threshold via shingle inverted index (shared kernel).
    * The shingle set feeds three subtrees (sizes, both join sides), so
    * callers persist it once — at cluster scale this is a few bytes per
    * shingle in memory-and-disk storage, far cheaper than re-explosions. */
  private def jaccardPairs(docs: DataFrame, threshold: Double,
                           candidates: Option[DataFrame] = None): DataFrame =
    jaccardPairsFromShingles(
      shingleRows(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      threshold, candidates)
      // The full-kernel result is persisted so plan-identical consumers in
      // one session (dedup_ngram_jaccard's output, dedup_clusters' edge
      // graph) materialize the inverted-index self-join once. Callers add
      // their own orderBy — keeping the cached plan canonical (unsorted)
      // is what makes the cache entry shared. Lifetime: these entries stay
      // cached for the session BY DESIGN (the sharing across queries is
      // the point); a long-lived host session reclaims them via
      // spark.catalog.clearCache() when the dedup pass is over — Verify
      // does exactly that — and MEMORY_AND_DISK means stale entries
      // degrade to disk rather than evicting hot executor memory.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Jaccard kernel over a prebuilt (doc_id, sh) shingle set.
    *
    * With a candidate set, the restriction is applied BEFORE the shingle
    * join: each candidate pair pulls only its two shingle sets, so the
    * cost is O(|candidates| · shingles-per-doc) — independent of the full
    * inverted-index blow-up. Filtering after the full self-join would make
    * LSH pointless (it would redo the exact all-pairs work). */
  private[llm] def jaccardPairsFromShingles(sh: DataFrame, threshold: Double,
                                       candidates: Option[DataFrame],
                                       broadcastCandidates: Boolean = true): DataFrame =
    intersectionCounts(sh, candidates, broadcastCandidates)
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Pairwise shingle-set intersection counts with both set sizes —
    * `(d1, d2, inter, n1, n2)` — the shared trunk under every set-overlap
    * score (Jaccard in [[jaccardPairsFromShingles]], containment in
    * [[dedupContainment]]): the scores differ only in the final one-row
    * arithmetic, so the join strategy lives once. */
  private[llm] def intersectionCounts(sh: DataFrame,
                                      candidates: Option[DataFrame],
                                      broadcastCandidates: Boolean = true): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val joined = candidates match {
      case Some(c) if broadcastCandidates =>
        // Candidate pairs are tiny (LSH output): broadcast them so the
        // first join streams the persisted shingle set with NO shuffle,
        // and broadcast the (still small: |cand| × shingles-per-doc)
        // result so the second join streams it too. The full shingle
        // relation is never exchanged during verification.
        broadcast(broadcast(c).join(sh.as("a"), col("d1") === col("a.doc_id")))
          .join(sh.as("b"), col("d2") === col("b.doc_id") && col("a.sh") === col("b.sh"))
          .groupBy(col("d1"), col("d2"))
          .agg(count(lit(1)).as("inter"))
      case Some(c) =>
        // LARGE candidate set (prefix-filter output is O(corpus), not
        // O(near-dups)): broadcasting cand × shingles-per-doc rows melts
        // the driver — measured 31 s vs 3 s at 5k docs — so the verify
        // SHUFFLES instead: candidates hash-join to each side's shingle
        // list and the intersection count is a map-side-combinable fold.
        c.join(sh.as("a"), col("d1") === col("a.doc_id"))
          .join(sh.as("b"), col("d2") === col("b.doc_id") && col("a.sh") === col("b.sh"))
          .groupBy(col("d1"), col("d2"))
          .agg(count(lit(1)).as("inter"))
      case None =>
        sh.as("a").join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("inter"))
    }
    // sizes stays a shuffle join: it is one row per document (broadcast
    // would not survive a billion-doc corpus) and `joined` is tiny.
    joined
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"), col("inter"),
        col("s1.n").as("n1"), col("s2.n").as("n2"))
  }

  private def jaccardSql(threshold: Double): String =
    s"""WITH $shingleSql,
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT d1, d2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
       |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
       |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= $threshold
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- exact

  def dedupExact: Q = (s, dir) => {
    Tables(s, dir).documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }

  val dedupExactSql: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text HAVING COUNT(*) > 1
      |ORDER BY keep_id""".stripMargin

  // ------------------------------------------------------- n-gram jaccard

  def dedupNgramJaccard: Q = (s, dir) =>
    jaccardPairs(Tables(s, dir).documents, 0.5).orderBy(col("d1"), col("d2"))

  val dedupNgramJaccardSql: String = jaccardSql(0.5)

  // ---------------------------------------------- n-gram jaccard, df-cap

  /** Stop-shingle cap: the exact kernel's self-join costs Σ df² over
    * shingle document frequencies, so one boilerplate shingle shared by
    * 10⁶ documents alone contributes 10¹² join rows. The scale fix is to
    * drop shingles with df > cap BEFORE the join (they carry no dedup
    * signal — near-dup pairs share many rare shingles, and the Jaccard is
    * then computed consistently on the capped sets). The hot-shingle list
    * is tiny by definition (the extreme tail of the df distribution), so
    * the restriction is a broadcast anti-join — no extra shuffle of the
    * shingle relation. */
  private def capShingles(sh: DataFrame, dfCap: Int): DataFrame = {
    val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("sh"))
    sh.join(broadcast(hot), Seq("sh"), "left_anti")
  }

  /** Cap chosen above the corpus max df (7 at sf0.01, 25 at sf0.1) so the
    * capped kernel's output is bit-identical to the exact kernel and the
    * exact-Jaccard oracle gates this path too; production corpora set it
    * to ~10⁴. The cap machinery (df agg + broadcast anti-join) runs
    * regardless — that is what this entry verifies. */
  val DfCap = 32

  def dedupNgramJaccardCapped: Q = (s, dir) => {
    val sh = capShingles(shingleRows(Tables(s, dir).documents), DfCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardPairsFromShingles(sh, 0.5, None).orderBy(col("d1"), col("d2"))
  }

  val dedupNgramJaccardCappedSql: String = jaccardSql(0.5)

  // ----------------------------------------------------------- containment

  /** CONTAINMENT dedup (Broder 1997's asymmetric resemblance):
    * `|A∩B| / min(|A|,|B|) ≥ 0.9` — the score that catches NEAR-SUBSET
    * duplication, which symmetric Jaccard structurally misses: a short
    * document quoted whole inside a long one has containment 1.0 but
    * Jaccard ≈ |short|/|long| → 0, so no Jaccard threshold can find it
    * without drowning in noise (DedupContainmentSpec pins exactly this
    * separation on a synthesized subset pair). The training-data
    * reading: boilerplate-wrapped articles, quoted reposts, and
    * truncated re-crawls are subset dupes, not symmetric ones.
    *
    * Shape: [[intersectionCounts]] — the same inverted-index trunk as
    * the Jaccard family; only the final one-row arithmetic differs. The
    * same scale disciplines compose unchanged (df-cap the join, or
    * prefix-filter it — for containment the prefix bound is even
    * stronger: only the SMALLER document needs a prefix, since the
    * required overlap is a fraction of min(|A|,|B|) alone). */
  def dedupContainment: Q = (s, dir) => {
    val sh = shingleRows(Tables(s, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    intersectionCounts(sh, None)
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / least(col("n1"), col("n2"))).as("containment"))
      .filter(col("containment") >= 0.9)
      .orderBy(col("d1"), col("d2"))
  }

  val dedupContainmentSql: String =
    s"""WITH $shingleSql,
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT d1, d2, CAST(i AS DOUBLE) / LEAST(s1.n, s2.n) AS containment
       |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
       |WHERE CAST(i AS DOUBLE) / LEAST(s1.n, s2.n) >= 0.9
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------- prefix-filtered (AllPairs)

  /** EXACT Jaccard join via prefix filtering (Bayardo et al.'s AllPairs /
    * Xiao et al.'s PPJoin candidate rule) — the deterministic 100 TB path
    * next to the probabilistic MinHash-LSH: same output as
    * [[dedupNgramJaccard]] (a theorem, asserted in DedupPrefixSpec), but
    * the self-join runs over each document's PREFIX only.
    *
    * The rule: order every document's shingles by a global total order
    * (df ASC, shingle ASC — rarest first, ties broken lexically so both
    * engines replay it verbatim); with threshold t = 1/2, two documents
    * with J ≥ t MUST share a shingle within each one's first
    * ⌊n/2⌋+1 shingles (if all prefix shingles of A miss B, the ≥
    * t/(1+t)·(|A|+|B|) shared shingles all sit in A's suffix — too short
    * to hold them). So the inverted-index self-join runs over prefixes
    * whose length is HALF the document, and — the real effect — the
    * rarest-first order means the prefix holds exactly the LOW-df
    * shingles: Σ df² over the joined index collapses because the
    * boilerplate head never enters it. The size-compatibility filter
    * (J ≥ 1/2 forces |A| ≤ 2|B| and |B| ≤ 2|A|) prunes candidates before
    * the verify, and PPJoin's POSITIONAL filter prunes harder: both
    * prefix lists carry the same global order, so at the FIRST shared
    * shingle (positions pa, pb) nothing earlier is common and
    * |A∩B| ≤ 1 + min(|A|−pa, |B|−pb); pairs whose bound cannot reach the
    * required overlap ⌈(|A|+|B|)/3⌉ die before any set is materialized
    * (3·ub ≥ |A|+|B| in pure integers, arg-min-by-position on both
    * engines).
    *
    * Scale shape: df join + per-doc window rank (doc-partitioned — fully
    * distributed), prefix self-join (the only quadratic-risk stage, now
    * df-bounded by construction), then the candidate-verify kernel in
    * SHUFFLE mode — prefix candidates are O(corpus) pairs, not O(near-
    * dups), so the LSH-style broadcast verify would ship |cand| ×
    * shingles-per-doc rows through the driver (measured 31 s → 3 s at 5k
    * docs from this choice alone). The ⌊n/2⌋+1 cut is the integer
    * predicate 2·(pos−1) ≤ n — no FP ceil to disagree across engines. */
  def dedupJaccardPrefix: Q = (s, dir) => {
    val sh = shingleRows(Tables(s, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val wAll = Window.partitionBy(col("doc_id"))
    val ranked = sh.join(df, "sh")
      .select(col("doc_id"), col("sh"), col("df"))
      .withColumn("pos", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val pref = ranked.filter(lit(2) * (col("pos") - 1) <= col("n"))
      .select(col("doc_id"), col("sh"), col("pos"), col("n"))
    val cands = pref.as("a")
      .join(pref.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") <= lit(2) * col("b.n") && col("b.n") <= lit(2) * col("a.n"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(
        min_by(
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) + 1,
          col("a.pos")).as("ub"),
        first(col("a.n")).as("n1"), first(col("b.n")).as("n2"))
      .filter(lit(3) * col("ub") >= col("n1") + col("n2"))
      .select(col("d1"), col("d2"))
    jaccardPairsFromShingles(sh, 0.5, Some(cands), broadcastCandidates = false)
      .orderBy(col("d1"), col("d2"))
  }

  val dedupJaccardPrefixSql: String =
    s"""WITH $shingleSql,
       |df AS (SELECT sh AS t, COUNT(*) AS df FROM sh GROUP BY 1),
       |rk AS (
       |  SELECT s.doc_id, s.sh,
       |    ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS pos,
       |    COUNT(*) OVER (PARTITION BY s.doc_id) AS n
       |  FROM sh s JOIN df d ON s.sh = d.t),
       |pref AS (SELECT doc_id, sh, pos, n FROM rk WHERE 2 * (pos - 1) <= n),
       |cand0 AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    arg_min(LEAST(a.n - a.pos, b.n - b.pos) + 1, a.pos) AS ub,
       |    ANY_VALUE(a.n) AS n1, ANY_VALUE(b.n) AS n2
       |  FROM pref a JOIN pref b
       |    ON a.sh = b.sh AND a.doc_id < b.doc_id
       |   AND a.n <= 2 * b.n AND b.n <= 2 * a.n
       |  GROUP BY 1, 2),
       |cand AS (SELECT d1, d2 FROM cand0 WHERE 3 * ub >= n1 + n2),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS i
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND a.sh = b.sh
       |  GROUP BY 1, 2)
       |SELECT d1, d2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
       |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
       |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------- novelty

  /** Per-document n-gram NOVELTY — the fraction of a document's distinct
    * shingles whose FIRST corpus occurrence (min doc_id, the ingestion
    * order) is this document. The training-data reading: low-novelty
    * documents restate earlier material (dedup candidates, curriculum
    * tail); high-novelty documents carry new content. This is the
    * document-level complement of pairwise dedup — one score per doc
    * instead of O(pairs), so it scales as a ranking signal where pair
    * enumeration can't.
    *
    * Shape: the persisted shingle kernel feeds a map-side-combinable MIN
    * fold (shingle → first owner) and one join back — two shuffles total,
    * both on the shingle key. The ratio is one exactly-rounded division
    * of two counts. */
  def dedupNovelty: Q = (s, dir) => {
    val sh = shingleRows(Tables(s, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstOwner = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstOwner, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val dedupNoveltySql: String =
    s"""WITH $shingleSql,
       |first_owner AS (SELECT sh AS g, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
       |SELECT doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  ROUND(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS novelty
       |FROM sh JOIN first_owner ON sh.sh = first_owner.g
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- minhash lsh

  /** Minhash-LSH candidate pairs over a prebuilt (doc_id, sh) shingle
    * relation — the banding half of the near-dup kernel, shared by the
    * standalone entry and the curation pipeline (review-r14: the block
    * was duplicated; a band/hash change must hit every consumer).
    *
    * Signature hashing uses native xxhash64 (single codegen'd call, no
    * string re-parsing): the hash family only determines candidate
    * RECALL — every candidate is exactly verified downstream, and the
    * oracle checks the verified output — so the internal hash is free
    * to be the fast one. (SimHash/fingerprint keep the portable
    * polynomial hash because their oracles recompute signatures.) pmod
    * keeps the affine minhash arithmetic in [0, M). The band relation
    * is persisted: a self-join's two sides are separate subtrees to
    * Spark, so without it the signature aggregation (the expensive hash
    * pass over every shingle) runs TWICE — once per side; 8 longs per
    * doc is the textbook cache point. */
  private[llm] def lshCandidates(sh: DataFrame): DataFrame = {
    val bands = bandRows(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
  }

  /** The banding half of [[lshCandidates]] as a relation: `(doc_id,
    * band, bh)` — 16 min-aggregates in one map-side-combinable pass,
    * then the 8 band keys posexplode. Extracted so the PERSISTED dedup
    * index ([[DedupIndex]]) builds and probes with the exact same hash
    * family as the in-query entries — a band/hash change must hit every
    * consumer (the same single-definition rule that extracted
    * [[lshCandidates]] itself). */
  private[llm] def bandRows(sh: DataFrame): DataFrame = {
    val shh = sh.withColumn("shh", pmod(xxhash64(col("sh")), lit(M)))
    val sig = shh.groupBy(col("doc_id"))
      .agg(min(minhashCol(col("shh"), 0)).as("mh0"),
        (1 until NumHashes).map(i => min(minhashCol(col("shh"), i)).as(s"mh$i")): _*)
    val bandArr = array((0 until NumBands).map(k =>
      bandHashCol(col(s"mh${2 * k}"), col(s"mh${2 * k + 1}"))): _*)
    sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band", "bh")))
  }

  /** LSH RECALL eval — the dedup family's measured certificate (what
    * [[graft.llm.Similarity]]'s knn_recall_eval is to IVF): at
    * threshold J ≥ 0.5 — where the b=8/r=2 banding's theoretical
    * candidate recall floor drops to 1−(1−J²)⁸ ≈ 0.9 for borderline
    * pairs — report true pairs, LSH candidates, verified-found pairs,
    * recall and candidate precision: the measured numbers that justify
    * (or refute) a banding configuration for THIS corpus before a
    * corpus-scale run commits to it (here the true pairs all sit at
    * J ≥ 0.96, so measured recall is 1.0 and precision ~0.76 — the
    * report is the point, not a fixed verdict).
    *
    * This entry banding uses the PORTABLE affine hash family end to end
    * (the production entries use xxhash64 internally, defensible there
    * because every candidate is exactly verified — here the CANDIDATE
    * set itself is the output, so the oracle must replay the
    * signatures). The true-pair side runs the exact inverted-index
    * kernel: at 100 TB this eval runs on a SAMPLE — the exact side is
    * the measurement harness, not the production path. */
  def lshRecallEval: Q = (s, dir) => {
    val Thr = 0.5
    val sh = shingleRows(Tables(s, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = split(col("sh"), " ")
    val shh = sh.select(col("doc_id"),
      (gramHashFoldCol((0 until 3).map(i => wordHashCol(element_at(w, i + 1))))
        % lit(M)).as("shh"))
    val sig = shh.groupBy(col("doc_id"))
      .agg(min(minhashCol(col("shh"), 0)).as("mh0"),
        (1 until NumHashes).map(i => min(minhashCol(col("shh"), i)).as(s"mh$i")): _*)
    val bandArr = array((0 until NumBands).map(k =>
      bandHashCol(col(s"mh${2 * k}"), col(s"mh${2 * k + 1}"))): _*)
    val bands = sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band", "bh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truePairs = jaccardPairsFromShingles(sh, Thr, None)
      .select(col("d1"), col("d2"))
    val found = jaccardPairsFromShingles(sh, Thr, Some(cands))
      .select(col("d1"), col("d2"))
    truePairs.agg(count(lit(1)).as("n_true"))
      .crossJoin(cands.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_true"), col("n_candidates"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true"), 6).as("recall"),
        round(col("n_found").cast("double") / col("n_candidates"), 6)
          .as("candidate_precision"))
  }

  val lshRecallEvalSql: String = {
    val mins = (0 until NumHashes)
      .map(i => s"MIN(${minhashSql("shh", i)}) AS mh$i").mkString(",\n|    ")
    val bandCases = (0 until NumBands)
      .map(k => s"WHEN $k THEN ${bandHashSql(s"mh${2 * k}", s"mh${2 * k + 1}")}")
      .mkString("\n|      ")
    val gram = gramHashFoldSql(
      Seq(wordHashSql("sw[1]"), wordHashSql("sw[2]"), wordHashSql("sw[3]")))
    s"""WITH $shingleSql,
       |sp AS (SELECT doc_id, string_split(sh, ' ') AS sw FROM sh),
       |shh AS (SELECT doc_id, ($gram) % $M AS shh FROM sp),
       |sig AS (SELECT doc_id,
       |    $mins
       |  FROM shh GROUP BY doc_id),
       |bands AS (SELECT doc_id, t.k AS band,
       |    CASE t.k
       |      $bandCases
       |    END AS bh
       |  FROM sig, UNNEST(range($NumBands)) AS t(k)),
       |cands AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |tp AS (SELECT d1, d2 FROM inter JOIN sz s1 ON d1 = s1.doc_id
       |       JOIN sz s2 ON d2 = s2.doc_id
       |       WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
       |fp AS (SELECT d1, d2 FROM tp JOIN cands USING (d1, d2)),
       |m AS (SELECT (SELECT COUNT(*) FROM tp) AS n_true,
       |        (SELECT COUNT(*) FROM cands) AS n_candidates,
       |        (SELECT COUNT(*) FROM fp) AS n_found)
       |SELECT n_true, n_candidates, n_found,
       |  ROUND(CAST(n_found AS DOUBLE) / n_true, 6) AS recall,
       |  ROUND(CAST(n_found AS DOUBLE) / n_candidates, 6) AS candidate_precision
       |FROM m""".stripMargin
  }

  /** Threshold SWEEP — the table a data engineer reads before picking
    * the dedup threshold everything downstream hard-codes: for each
    * candidate J threshold, the pair count, the docs a keep-first pass
    * would remove, and the bytes reclaimed, ALL from one evaluation of
    * the exact pair kernel (the inverted-index trunk runs once at the
    * loosest threshold; the sweep is four filtered re-aggregations of
    * the persisted pair relation — the marginal threshold costs nothing
    * at any scale). */
  def dedupThresholdSweep: Q = (s, dir) => {
    val docs = Tables(s, dir).documents
    val sh = shingleRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = jaccardPairsFromShingles(sh, 0.5, None)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chars = docs.select(col("doc_id"), col("n_chars"))
    Seq(0.5, 0.7, 0.8, 0.9).map { t =>
      val p = pairs.filter(col("jaccard") >= t)
      val removed = p.select(col("d2").as("doc_id")).distinct().join(chars, "doc_id")
      p.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(removed.agg(count(lit(1)).as("n_docs_removed"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_removed")))
        .select(lit(t).as("threshold"), col("n_pairs"),
          col("n_docs_removed"), col("chars_removed"))
    }.reduce(_ unionByName _).orderBy(col("threshold"))
  }

  val dedupThresholdSweepSql: String = {
    def row(t: String): String =
      s"""SELECT CAST($t AS DOUBLE) AS threshold,
         |  (SELECT COUNT(*) FROM pj WHERE jaccard >= $t) AS n_pairs,
         |  (SELECT COUNT(*) FROM
         |    (SELECT DISTINCT d2 FROM pj WHERE jaccard >= $t)) AS n_docs_removed,
         |  (SELECT COALESCE(CAST(SUM(n_chars) AS BIGINT), 0) FROM documents
         |   WHERE doc_id IN (SELECT DISTINCT d2 FROM pj WHERE jaccard >= $t))
         |    AS chars_removed""".stripMargin
    s"""WITH $shingleSql,
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pj AS (SELECT d1, d2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
       |       FROM inter JOIN sz s1 ON d1 = s1.doc_id
       |       JOIN sz s2 ON d2 = s2.doc_id
       |       WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5)
       |${Seq("0.5", "0.7", "0.8", "0.9").map(row).mkString("\nUNION ALL\n")}
       |ORDER BY threshold""".stripMargin
  }

  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    // One persisted shingle pass feeds signature generation AND exact
    // verification — the explode+distinct is the expensive part.
    val shAll = shingleRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Exact verification of LSH candidates — output is exact-Jaccard pairs.
    jaccardPairsFromShingles(shAll, 0.8, Some(lshCandidates(shAll)))
  }

  def dedupMinhashLsh: Q = (s, dir) =>
    minhashVerifiedPairs(s, dir).orderBy(col("d1"), col("d2"))

  // --------------------------------------------------- cross-modal audit

  /** Cross-modal duplicate AUDIT: every textual near-duplicate pair (the
    * minhash-LSH → exact-Jaccard pipeline, J ≥ 0.8) annotated with its
    * EMBEDDING-space agreement — the dedup-pipeline triage view that
    * separates "same text, same meaning" (safe to drop either copy) from
    * "same text, unrelated embeddings" (a template/boilerplate artifact:
    * dropping one may lose a semantically distinct document, and the
    * disagreement itself is an embedding-quality signal worth surfacing).
    * Deliberately an ANNOTATION, not a filter: on this corpus the text
    * duplicates are embedding-independent (cosine ≈ 0 for every pair —
    * measured before this entry was shaped, to avoid a vacuous
    * threshold), and a production corpus is the opposite — either way
    * the audit reports, humans set policy.
    *
    * Scale shape: the pair relation is LSH-bounded (never all-pairs);
    * both vector fetches broadcast the SMALL side so the embedding
    * relation streams once per side with no shuffle; the cosine is the
    * shared exact dot fold, round-9 quantized cross-engine. */
  def dedupCrossmodalAudit: Q = (s, dir) => {
    val pairs = minhashVerifiedPairs(s, dir)
    val emb = Similarity.normalized(Tables(s, dir))
    val cos = round(graft.functions.VectorFunctions.dotp(col("v1"), col("v2")), 9)
    broadcast(broadcast(pairs)
        .join(emb.select(col("vec_id").as("d1"), col("vn").as("v1")), Seq("d1")))
      .join(emb.select(col("vec_id").as("d2"), col("vn").as("v2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("jaccard"),
        cos.as("cos_sim"),
        when(cos >= 0.5, 1).otherwise(0).cast("int").as("semantic_agree"))
      .orderBy(col("d1"), col("d2"))
  }

  val dedupCrossmodalAuditSql: String =
    s"""WITH ${Similarity.normalizedSql}
       |SELECT p.d1, p.d2, p.jaccard,
       |  ROUND(list_dot_product(a.vn, b.vn), 9) AS cos_sim,
       |  CAST(CASE WHEN ROUND(list_dot_product(a.vn, b.vn), 9) >= 0.5
       |    THEN 1 ELSE 0 END AS INTEGER) AS semantic_agree
       |FROM (${jaccardSql(0.8)}) p
       |JOIN e a ON a.vec_id = p.d1
       |JOIN e b ON b.vec_id = p.d2
       |ORDER BY d1, d2""".stripMargin

  /** LSH recall at the J≥0.96 duplicates present is 1 - (1-J²)^8 ≈ 1-1e-9,
    * and no pairs exist in (0.5, 0.96), so the exact-Jaccard oracle is the
    * correct reference for the verified-candidate output. */
  val dedupMinhashLshSql: String = jaccardSql(0.8)

  // ------------------------------------------------------------- simhash

  /** Per-doc 32-bit SimHash: explode words, one 32-column conditional-sum
    * aggregation (bit votes), recombine to a signature. */
  private def simhashSigs(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("g", spreadCol(wordHashCol(col("w"))))
    val votes = words.groupBy(col("doc_id"))
      .agg(sum(when(bitCol(col("g"), 0) === 1, 1).otherwise(-1)).as("v0"),
        (1 until SimBits).map(b =>
          sum(when(bitCol(col("g"), b) === 1, 1).otherwise(-1)).as(s"v$b")): _*)
    val sig = (0 until SimBits).map(b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  private val simhashSigSql: String = {
    val wh = wordHashSql("w")
    val g = spreadSql(wh)
    val voteCols = (0 until SimBits)
      .map(b => s"SUM(CASE WHEN ${bitSql("g", b)} = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val sig = (0 until SimBits)
      .map(b => s"CASE WHEN v$b >= 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""words AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
       |spread AS (SELECT doc_id, $g AS g FROM words),
       |votes AS (SELECT doc_id, $voteCols FROM spread GROUP BY doc_id),
       |sims AS (SELECT doc_id, $sig AS simhash FROM votes)""".stripMargin
  }

  def dedupSimhash: Q = (s, dir) => {
    val sims = simhashSigs(Tables(s, dir).documents)
    // 4 bands × 8 bits: pigeonhole guarantees a shared band at hamming ≤ 3.
    val bandArr = array((0 until 4).map(k =>
      floor(col("simhash") / lit(math.pow(2, 8 * k))).cast("long") % 256): _*)
    // Persisted for the same reason as the MinHash bands: the self-join
    // would otherwise evaluate the 32-column bit-vote aggregation twice.
    val bands = sims.select(col("doc_id"), col("simhash"), posexplode(bandArr).as(Seq("band", "bh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.simhash").as("h1"), col("y.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  val dedupSimhashSql: String =
    s"""WITH $simhashSigSql,
       |bands AS (SELECT doc_id, simhash, k AS band,
       |            CAST(FLOOR(simhash / (256.0 ** k)) AS BIGINT) % 256 AS bh
       |          FROM sims, UNNEST(range(4)) AS t(k))
       |SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------ clusters

  /** Distributed min-label connected components over an undirected pair
    * list (columns `d1`, `d2`): returns (node, label) where label is the
    * minimum node id reachable from `node`. Shared by the text
    * ([[dedupClusters]]) and embedding
    * ([[Similarity.embeddingDedupClusters]]) dedup families.
    *
    * Implementation is min-label propagation (Pregel shape): each
    * iteration is one join + min-aggregate over the edge list, all
    * executor-side. Eager localCheckpoint on the edge list and on every
    * label generation materializes AND truncates lineage, so each
    * iteration's logical plan stays constant-size (labels are referenced
    * twice per round — with plain persist the plan doubles per round and
    * Catalyst analysis time compounds; see dedupClustersStar for the
    * measured version of this failure mode). Iteration count is bounded
    * by component diameter — near-dup clusters are shallow, so this
    * converges in 2-3 rounds; the large-star/small-star variant is the
    * upgrade path for deep chains.
    *
    * Convergence check: labels only ever decrease, so the label sum is a
    * strictly decreasing potential — one cheap aggregate per iteration
    * instead of a join against the previous generation. An EMPTY pair
    * list short-circuits to the empty (node, label) frame (the sum
    * aggregate over zero rows is null — getLong would NPE). */
  private[llm] def minLabelComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint(true)
    var labels = edges.select(col("d1").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    if (labels.isEmpty) return labels
    var prevSum = labels.agg(sum(col("label"))).head.getLong(0)
    var converged = false
    while (!converged) {
      val prop = edges.join(labels, col("d2") === col("node"))
        .select(col("d1").as("node"), col("label"))
      val next = labels.unionByName(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = next.agg(sum(col("label"))).head.getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
    }
    labels
  }

  /** Near-dup clusters: connected components over the exact-Jaccard pair
    * graph (threshold 0.5), labeling every member with the minimum doc_id
    * of its component — the canonical-representative step that turns
    * pairwise dedup into "keep one per cluster". */
  def dedupClusters: Q = (s, dir) => {
    // The kernel result is already persisted inside jaccardPairs, so both
    // symmetric-union branches (and dedup_ngram_jaccard in the same
    // session) read one materialization.
    val pairs = jaccardPairs(Tables(s, dir).documents, 0.5)
      .select(col("d1"), col("d2"))
    minLabelComponents(pairs)
      .select(col("node").as("doc_id"), col("label").as("component"))
      .orderBy(col("doc_id"))
  }

  /** Shared oracle CTE chain: the exact-Jaccard ≥ 0.5 pair graph closed
    * transitively (`reach`) — the prefix under every component-consuming
    * oracle ([[dedupClustersSql]], [[dedupKeepLongestSql]]). Declared
    * BEFORE its interpolating consumers: object vals initialize in
    * declaration order, and a forward reference interpolates null. */
  private[llm] val componentReachSqlCtes: String =
    s"""$shingleSql,
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT d1, d2
       |          FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
       |          WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
       |bi AS (SELECT d1 AS a, d2 AS b FROM pairs
       |       UNION SELECT d2, d1 FROM pairs),
       |reach AS (SELECT a, b FROM bi
       |          UNION
       |          SELECT r.a, e.b FROM reach r JOIN bi e ON r.b = e.a)""".stripMargin

  /** Quality-aware cluster representative selection — the KEEP-BEST
    * half of near-dup dedup that [[dedupClusters]] stops short of (and
    * the keep-FIRST rule the curation pipeline uses, upgraded to the
    * rule production corpora actually ship: keep the LONGEST member of
    * each duplicate cluster, the fullest crawl of the page). Emits the
    * REMOVED docs with their kept representative — the audit trail a
    * dedup pass leaves behind.
    *
    * Shape: the component labels come from the same min-label kernel
    * (lineage already cut by its per-iteration checkpoints); the argmax
    * per component is one max(struct(n_chars, −doc_id)) hash aggregate
    * — no per-cluster sort, no window — and the members join back on
    * the component key. Tie rule: longest, then smallest doc_id. */
  def dedupKeepLongest: Q = (s, dir) => {
    val docs = Tables(s, dir).documents
    val pairs = jaccardPairs(docs, 0.5).select(col("d1"), col("d2"))
    val comps = minLabelComponents(pairs)
      .select(col("node").as("doc_id"), col("label").as("component"))
    val sized = comps.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    val best = sized.groupBy(col("component"))
      .agg(max(struct(col("n_chars").as("nc"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("component"), (-col("b.nid")).as("kept_doc"),
        col("b.nc").as("kept_chars"))
    sized.join(best, "component")
      .filter(col("doc_id") =!= col("kept_doc"))
      .select(col("component"), col("doc_id"), col("n_chars"),
        col("kept_doc"), col("kept_chars"))
      .orderBy(col("component"), col("doc_id"))
  }

  val dedupKeepLongestSql: String =
    s"""WITH RECURSIVE $componentReachSqlCtes,
       |comp AS (SELECT a AS doc_id, LEAST(MIN(b), a) AS component
       |         FROM reach GROUP BY a),
       |sized AS (SELECT c.doc_id, c.component, d.n_chars
       |          FROM comp c JOIN documents d USING (doc_id)),
       |best AS (SELECT component, doc_id AS kept_doc, n_chars AS kept_chars
       |         FROM (SELECT component, doc_id, n_chars,
       |                 ROW_NUMBER() OVER (PARTITION BY component
       |                   ORDER BY n_chars DESC, doc_id) AS r
       |               FROM sized) t WHERE r = 1)
       |SELECT s.component, s.doc_id, s.n_chars, b.kept_doc, b.kept_chars
       |FROM sized s JOIN best b USING (component)
       |WHERE s.doc_id <> b.kept_doc
       |ORDER BY s.component, s.doc_id""".stripMargin

  /** Oracle: the same pair graph closed transitively with a recursive CTE,
    * component = min reachable doc_id (including self). */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $componentReachSqlCtes
       |SELECT a AS doc_id, LEAST(MIN(b), a) AS component
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** Connected components via LARGE-STAR / SMALL-STAR alternation
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the deep-chain-safe variant of [[dedupClusters]]: min-label
    * propagation needs rounds proportional to component DIAMETER, while
    * star contraction converges in O(log² n) rounds regardless of shape.
    * Same output contract and the same recursive-CTE oracle.
    *
    * Each round is two groupBy-min aggregates + two equi-joins over the
    * edge list — every step partitioned by node id, map-side-combinable;
    * only a (count, hash-sum) convergence signature crosses the driver.
    *
    *   - large-star: every node links its larger neighbors to its
    *     min-neighbor (or itself) — long chains fold toward minima;
    *   - small-star: every node links its smaller-or-equal neighbors and
    *     itself to their minimum — stars flatten;
    *   - fixed point: every edge is (member → component-min).
    */
  def dedupClustersStar: Q = (s, dir) => {
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
      bidir.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val j = oriented.join(mins, "u")
      j.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(j.select(col("u"), col("m").as("v")))
        .distinct()
    }
    // Convergence signature: count + order-independent hash-sum of the
    // canonically-oriented edge set — one scalar row to the driver. The
    // sum runs in DECIMAL(38,0) so it cannot overflow under ANSI mode at
    // any edge count.
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(
          sum(xxhash64(greatest(col("u"), col("v")), least(col("u"), col("v")))
            .cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))
      ).head
      (r.getLong(0), r.getDecimal(1))
    }
    // Lineage discipline — the load-bearing line of any iterative Spark
    // algorithm: one star round references its input ~16× (self-unions +
    // join sides), so plans grow ~16× per generation and Catalyst
    // ANALYSIS — not execution — becomes the cost (measured: 60+ s of
    // driver time at 2 generations with plain persist). Eager
    // `localCheckpoint` materializes the generation AND truncates its
    // logical plan to a LogicalRDD, keeping every generation's plan
    // constant-size. Same discipline GraphX/GraphFrames apply to
    // iterative graph state.
    var edges = jaccardPairs(Tables(s, dir).documents, 0.5)
      .select(col("d1").as("u"), col("d2").as("v"))
      .localCheckpoint(true)
    var sig = signature(edges)
    var converged = false
    while (!converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      edges = next
      sig = nextSig
    }
    // Fixed point is a star forest: (member → root) plus the roots
    // themselves labeling their own component.
    // Final star generation is a materialized LogicalRDD; the returned
    // plan reads it directly (blocks reclaimed at session teardown).
    val members = edges.select(col("u").as("doc_id"), col("v").as("component"))
    val roots = edges.select(col("v")).distinct()
      .select(col("v").as("doc_id"), col("v").as("component"))
    members.union(roots).distinct().orderBy(col("doc_id"))
  }

  /** Star contraction computes the same components as label propagation. */
  val dedupClustersStarSql: String = dedupClustersSql

  // ------------------------------------------------------------- savings

  /** Dedup accounting per source: after exact dedup (keep lowest doc_id
    * per text), how many docs each source kept, how many raw copies it
    * had, and how many chars the dedup saved — the reporting step every
    * dedup pass ends with. Attribution follows the KEPT doc's source
    * (min_by doc_id, deterministic). */
  def dedupSavings: Q = (s, dir) => {
    val g = Tables(s, dir).documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"),
           min_by(col("source"), col("doc_id")).as("src"),
           count(lit(1)).as("copies"),
           first(col("n_chars")).as("nc"))   // n_chars is a function of text
    g.groupBy(col("src"))
      .agg(count(lit(1)).as("kept_docs"),
           sum(col("copies")).cast("long").as("total_docs"),
           sum((col("copies") - 1) * col("nc")).cast("long").as("chars_saved"))
      .orderBy(col("src"))
  }

  val dedupSavingsSql: String =
    """WITH g AS (
      |  SELECT MIN(doc_id) AS keep_id, arg_min(source, doc_id) AS src,
      |    COUNT(*) AS copies, ANY_VALUE(n_chars) AS nc
      |  FROM documents GROUP BY text)
      |SELECT src, COUNT(*) AS kept_docs,
      |  CAST(SUM(copies) AS BIGINT) AS total_docs,
      |  CAST(SUM((copies - 1) * nc) AS BIGINT) AS chars_saved
      |FROM g GROUP BY src ORDER BY src""".stripMargin

  // --------------------------------------------------------- fingerprint

  /** Order-sensitive positional fingerprint per document. */
  def docFingerprint: Q = (s, dir) => {
    Tables(s, dir).documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("term", fpTermCol(wordHashCol(col("w")), col("pos")))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % lit(M)).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  val docFingerprintSql: String = {
    val term = fpTermSql(wordHashSql("wl[i+1]"), "i")
    s"""WITH wl AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents)
       |SELECT doc_id,
       |  CAST(list_aggregate(list_transform(range(len(wl)), i -> $term), 'sum') % $M AS BIGINT) AS fingerprint
       |FROM wl ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- contamination

  /** Benchmark decontamination (the GPT-3-style exact n-gram overlap
    * check): flag training documents sharing word-3-gram shingles with an
    * eval/benchmark set — here the deterministic pseudo-benchmark
    * `doc_id % 97 == 0`, standing in for a real eval suite.
    *
    * 100 TB shape: benchmark suites are tiny (10⁴–10⁶ grams) next to a
    * training corpus, so the DISTINCT eval-gram set is broadcast and the
    * train side streams through a map-side hash join — the full corpus
    * shingle relation is never shuffled. Only matched grams reach the
    * per-doc count shuffle, which is map-side-combinable. Output is every
    * contaminated-candidate doc with its overlap share; the `drop`
    * decision thresholds the share (5% here, per-suite in practice). */
  def contaminationCheck: Q = (s, dir) => {
    // Same canonical shingle plan as the Jaccard kernel ⇒ the cache
    // manager serves it from the session's existing persisted entry.
    val sh = shingleRows(Tables(s, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalGrams = sh.filter(col("doc_id") % 97 === 0)
      .select(col("sh")).distinct()
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    val sizes = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    train.join(broadcast(evalGrams), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))   // (doc_id, sh) distinct upstream
      .join(sizes, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams") >= 0.05).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  val contaminationCheckSql: String =
    s"""WITH $shingleSql,
       |ev AS (SELECT DISTINCT sh.sh FROM sh WHERE doc_id % 97 = 0),
       |tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
       |sz AS (SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY doc_id),
       |hit AS (SELECT doc_id, COUNT(*) AS n_shared
       |        FROM tr JOIN ev USING (sh) GROUP BY doc_id)
       |SELECT doc_id, n_grams, n_shared,
       |  CAST(n_shared AS DOUBLE) / n_grams >= 0.05 AS contaminated
       |FROM hit JOIN sz USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Decontamination via a Bloom membership sketch — the 100 TB shape of
    * [[contaminationCheck]]. The exact variant broadcasts the DISTINCT
    * eval-gram SET (gigabytes once the eval suite is large); this one
    * reduces the eval side to a ~100 KB Bloom filter in ONE aggregate
    * (Spark's own `BloomFilterAggregate`, surfaced as `graft_bloom_agg`),
    * attaches it as a literal, and probes every train gram scan-side with
    * `graft_might_contain` — the train table is never shuffled until
    * after the (rare) hits are counted.
    *
    * Gate: Bloom filters have NO false negatives, so for every exactly
    * contaminated doc the sketch must flag at least its shared grams —
    * emitted as `bloom_caught_all`, which the oracle pins to TRUE. The
    * false-positive set is sketch-parameter-specific (measured
    * engine-side in BloomMembershipSpec, not oracle-predictable), so the
    * output keys on the exact hit set. */
  def contaminationBloom: Q = (s, dir) => {
    val sh = shingleRows(Tables(s, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalSide = sh.filter(col("doc_id") % 97 === 0)
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    // Build step (tiny job): eval grams → one 800-kbit sketch, collected
    // once and inlined as a foldable literal — the two-job pattern a
    // production decontamination run uses to keep the probe scan-fused.
    val bf = evalSide
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("sh")), lit(100000L), lit(800000L)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val flagged = train
      .filter(call_function("graft_might_contain", lit(bf), xxhash64(col("sh"))))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_flagged"))
    val exact = train.join(broadcast(evalSide.select(col("sh")).distinct()), "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    exact.join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shared"),
        (coalesce(col("n_flagged"), lit(0L)) >= col("n_shared")).as("bloom_caught_all"))
      .orderBy(col("doc_id"))
  }

  val contaminationBloomSql: String =
    s"""WITH $shingleSql,
       |ev AS (SELECT DISTINCT sh.sh FROM sh WHERE doc_id % 97 = 0),
       |tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
       |SELECT doc_id, COUNT(*) AS n_shared, TRUE AS bloom_caught_all
       |FROM tr JOIN ev USING (sh) GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Incremental corpus delta: classify every document across two crawl
    * snapshots as added / removed / changed / unchanged — the primitive
    * behind incremental ingestion (recompute only what moved instead of
    * re-processing the whole corpus). Snapshots are derived
    * deterministically from `documents` (old drops doc_id % 11 = 3, new
    * drops % 13 = 5 and appends a revision marker at % 7 = 2).
    *
    * Scale shape: each side is reduced AT THE SCAN to
    * (doc_id, xxhash64(text)) — 16 bytes/row — before the full-outer
    * join, so the shuffle never carries document text; at 100 TB the
    * delta detect moves ~1/1000th of the corpus bytes. Content equality
    * is hash equality (engine-native xxhash64; a collision would
    * misclassify one changed doc as unchanged — the standard, accepted
    * trade of every content-hash delta pipeline). The oracle compares
    * the text itself (IS NOT DISTINCT FROM — null text on both sides is
    * "unchanged", matching xxhash64's null-skip seed on the Spark side),
    * so the gate proves hash-classification ≡ content-classification on
    * this corpus. Output: per-class doc counts + doc_id checksums. */
  def incrementalDelta: Q = (s, dir) => {
    val docs = Tables(s, dir).documents
    val old = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), xxhash64(col("text")).as("h_old"))
    val neu = docs.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"),
        xxhash64(when(col("doc_id") % 7 === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("change"))
      .groupBy("change")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("change")
  }

  val incrementalDeltaSql: String =
    """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3),
      |n AS (SELECT doc_id,
      |        CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS text
      |      FROM documents WHERE doc_id % 13 <> 5),
      |cls AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
      |       ELSE 'changed' END AS change
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT change, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM cls GROUP BY change ORDER BY change""".stripMargin

  /** Duplicated-SPAN detection — the token-level sibling of the doc-level
    * dedup family (the "exact substring dedup" of Lee et al., Deduplicating
    * Training Data Makes Language Models Better, approximated at fixed
    * window W=8 tokens instead of a suffix array). A span is a maximal run
    * of 8-gram starts, each of which occurs in ≥2 distinct documents;
    * overlapping/adjacent matched starts (gap ≤ W) merge into one span, so
    * a verbatim 30-token quotation reports as ONE span of length 30, not
    * 23 overlapping grams. Output per affected doc: dup-gram count, span
    * count, longest span, covered tokens, coverage ratio.
    *
    * Scale shape: the gram stream (one row per token, the big intermediate)
    * aggregates by gram with map-side partials to find cross-doc grams;
    * matched positions then shuffle ONCE by doc_id and both windows (lag
    * for the gap flag, running sum for the island id) plus the span and
    * per-doc folds all share that one exchange+sort — the plan is
    * scan → agg → join → one sort, no second doc-keyed shuffle. At 100 TB
    * swap the gram string for xxhash64(gram) before the first shuffle
    * (8 bytes/row instead of ~50) — kept as the string here so the DuckDB
    * oracle recomputes identical keys. Docs shorter than W are filtered
    * before gram generation (Spark's `sequence` would otherwise run
    * DESCENDING for a negative span — silent garbage, not an error). */
  def dedupSubstringSpans: Q = (s, dir) => {
    val W = 8
    val d = Tables(s, dir).documents
      .select(col("doc_id"), split(col("text"), " ").as("wl"))
      .filter(size(col("wl")) >= W)
    val grams = d.select(
      col("doc_id"), size(col("wl")).as("n_tok"),
      posexplode(transform(sequence(lit(0), size(col("wl")) - W),
        i => array_join(slice(col("wl"), i + 1, lit(W)), " "))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "gram")
    val dup = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("gram")
    val matched = grams.join(dup, Seq("gram"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val islands = matched
      .withColumn("gap", when(
        col("p") - lag(col("p"), 1).over(byDoc) > W || lag(col("p"), 1).over(byDoc).isNull,
        1L).otherwise(0L))
      .withColumn("island", sum(col("gap")).over(byDoc))
    val spans = islands.groupBy(col("doc_id"), col("n_tok"), col("island"))
      .agg(count(lit(1)).as("g_in_span"),
        (max(col("p")) - min(col("p")) + W).as("span_len"))
    spans.groupBy(col("doc_id"), col("n_tok"))
      .agg(sum(col("g_in_span")).as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        max(col("span_len")).as("longest_span"),
        sum(col("span_len")).as("dup_tokens"))
      .withColumn("coverage",
        round(col("dup_tokens").cast("double") / col("n_tok"), 6))
      .select(col("doc_id"), col("n_dup_grams"), col("n_spans"),
        col("longest_span").cast("long").as("longest_span"),
        col("dup_tokens").cast("long").as("dup_tokens"), col("coverage"))
      .orderBy(col("doc_id"))
  }

  val dedupSubstringSpansSql: String =
    """WITH dl AS (
      |  SELECT doc_id, string_split(text, ' ') AS wl FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8),
      |g AS (
      |  SELECT doc_id, len(wl) AS n_tok, i AS p,
      |         array_to_string(wl[i:i+7], ' ') AS gram
      |  FROM dl, UNNEST(generate_series(1, len(wl) - 7)) AS t(i)),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
      |m AS (SELECT g.* FROM g SEMI JOIN dup USING (gram)),
      |isl AS (
      |  SELECT doc_id, n_tok, p,
      |         SUM(CASE WHEN prev IS NULL OR p - prev > 8 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY p) AS island
      |  FROM (SELECT doc_id, n_tok, p,
      |          LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM m)),
      |spans AS (
      |  SELECT doc_id, n_tok, island, COUNT(*) AS g_in_span,
      |         MAX(p) - MIN(p) + 8 AS span_len
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT doc_id, CAST(SUM(g_in_span) AS BIGINT) AS n_dup_grams, COUNT(*) AS n_spans,
      |       CAST(MAX(span_len) AS BIGINT) AS longest_span,
      |       CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
      |       ROUND(CAST(SUM(span_len) AS DOUBLE) / n_tok, 6) AS coverage
      |FROM spans GROUP BY doc_id, n_tok ORDER BY doc_id""".stripMargin

  /** [[dedupSubstringSpans]] at HASH-GRAM width — the Scaladoc-promised
    * 100 TB form: each 8-gram is folded to a 44-bit integer
    * ([[TextHash.gramHashCol]]) BEFORE the first shuffle, so the gram
    * aggregation exchanges 8 bytes per token instead of the ~50-byte gram
    * string — the dominant shuffle of the operator drops ~6×. Everything
    * downstream (cross-doc filter, one doc-keyed sort, islands, spans) is
    * identical. The oracle recomputes the same fold in DuckDB, so the
    * gate stays exact; a hash collision would merge two grams identically
    * in both engines, and the spec additionally certifies hashed output ≡
    * string output at test SF (collision check). Production swaps the
    * portable fold for `xxhash64(gram)` — same plan, same width. */
  def dedupSubstringSpansHashed: Q = (s, dir) => {
    val W = 8
    val d = Tables(s, dir).documents
      .select(col("doc_id"), split(col("text"), " ").as("wl"))
      .filter(size(col("wl")) >= W)
      // Hash each TOKEN once — a token participates in up to W grams, and
      // folding over the precomputed hash array costs 8 multiply-adds per
      // gram instead of 8 re-hashes (first cut measured 8.9 s at sf0.1
      // from exactly that; this form runs at the string variant's speed
      // while still shuffling 8-byte grams).
      .withColumn("wh", transform(col("wl"), w => TextHash.wordHashCol(w)))
    val grams = d.select(
      col("doc_id"), size(col("wl")).as("n_tok"),
      posexplode(transform(sequence(lit(0), size(col("wl")) - W),
        i => TextHash.gramHashFoldCol(
          (0 until W).map(k => element_at(col("wh"), i + k + 1))))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "gram")
    val dup = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("gram")
    val matched = grams.join(dup, Seq("gram"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val islands = matched
      .withColumn("gap", when(
        col("p") - lag(col("p"), 1).over(byDoc) > W || lag(col("p"), 1).over(byDoc).isNull,
        1L).otherwise(0L))
      .withColumn("island", sum(col("gap")).over(byDoc))
    val spans = islands.groupBy(col("doc_id"), col("n_tok"), col("island"))
      .agg(count(lit(1)).as("g_in_span"),
        (max(col("p")) - min(col("p")) + W).as("span_len"))
    spans.groupBy(col("doc_id"), col("n_tok"))
      .agg(sum(col("g_in_span")).as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        max(col("span_len")).as("longest_span"),
        sum(col("span_len")).as("dup_tokens"))
      .withColumn("coverage",
        round(col("dup_tokens").cast("double") / col("n_tok"), 6))
      .select(col("doc_id"), col("n_dup_grams"), col("n_spans"),
        col("longest_span").cast("long").as("longest_span"),
        col("dup_tokens").cast("long").as("dup_tokens"), col("coverage"))
      .orderBy(col("doc_id"))
  }

  val dedupSubstringSpansHashedSql: String = {
    val gram = TextHash.gramHashFoldSql((0 until 8).map(k => s"wh[i+$k]"))
    s"""WITH dl AS (
      |  SELECT doc_id, wl, list_transform(wl, w -> ${TextHash.wordHashSql("w")}) AS wh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents)
      |  WHERE len(wl) >= 8),
      |g AS (
      |  SELECT doc_id, len(wl) AS n_tok, i AS p,
      |         $gram AS gram
      |  FROM dl, UNNEST(generate_series(1, len(wl) - 7)) AS t(i)),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
      |m AS (SELECT g.* FROM g SEMI JOIN dup USING (gram)),
      |isl AS (
      |  SELECT doc_id, n_tok, p,
      |         SUM(CASE WHEN prev IS NULL OR p - prev > 8 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY p) AS island
      |  FROM (SELECT doc_id, n_tok, p,
      |          LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM m)),
      |spans AS (
      |  SELECT doc_id, n_tok, island, COUNT(*) AS g_in_span,
      |         MAX(p) - MIN(p) + 8 AS span_len
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT doc_id, CAST(SUM(g_in_span) AS BIGINT) AS n_dup_grams, COUNT(*) AS n_spans,
      |       CAST(MAX(span_len) AS BIGINT) AS longest_span,
      |       CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
      |       ROUND(CAST(SUM(span_len) AS DOUBLE) / n_tok, 6) AS coverage
      |FROM spans GROUP BY doc_id, n_tok ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ winnowing

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS algorithm): per document, hash every k-gram, slide a window
    * of w consecutive gram hashes, and select each window's minimum
    * (ties → RIGHTMOST, the paper's robust-winnowing rule). The selected
    * set is a position-spread fingerprint sketch with the paper's
    * guarantee: any shared substring of ≥ w+k−1 tokens between two
    * documents yields at least one SHARED selected fingerprint — so
    * partial overlap is detectable from sketches ~2/(w+1) the gram count.
    * Output: document pairs sharing ≥ 2 distinct fingerprint hashes, the
    * plagiarism/near-dup candidate set.
    *
    * Determinism/portability: the (hash, rightmost-pos) argmin is encoded
    * as ONE int64 key — gram hash (44-bit Horner fold both engines
    * recompute) × 2¹⁹ + (2¹⁹−1−pos) — so the per-window selection is a
    * plain MIN both engines evaluate identically; each token is hashed
    * once and rides its ≤ k grams via lead() over the same (doc, pos)
    * sort the gram fold uses.
    *
    * Scale: everything up to the pair join is one doc-partitioned window
    * pass (shared exchange) + a distinct; the pair join keys on
    * fingerprint hashes whose per-key frequency a df-cap bounds exactly
    * like `dedup_ngram_jaccard_capped` (a boilerplate-phrase fingerprint
    * shared by 10⁵ docs would otherwise square; the cap drops it — the
    * documented 100 TB path, not applied here where the oracle certifies
    * the exact form). */
  private val WinnowK = 4 // tokens per gram
  private val WinnowW = 5 // gram hashes per window
  private val PosBits = 19L // pos < 2^19; key = gh * 2^19 + (2^19-1-pos)

  def dedupWinnow: Q = (s, dir) => {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val frame = byPos.rowsBetween(0, WinnowW - 1)
    val toks = Tables(s, dir).documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("wh", wordHashCol(col("w")))
    val grams = toks
      .withColumn("gh", gramHashFoldCol(
        (0 until WinnowK).map(i => lead(col("wh"), i).over(byPos))))
      .withColumn("gn", lead(col("wh"), WinnowK - 1).over(byPos))
      .filter(col("gn").isNotNull) // drop tail positions with no full gram
      .select(col("doc_id"), col("pos"),
        (col("gh") * lit(1L << PosBits) +
          (lit((1L << PosBits) - 1) - col("pos"))).as("key"))
    val fps = grams
      .withColumn("sel", min(col("key")).over(frame))
      .withColumn("nw", count(lit(1)).over(frame))
      .filter(col("nw") === WinnowW) // only full windows select
      .select(col("doc_id"), shiftright(col("sel"), PosBits.toInt).as("fp"))
      .distinct()
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val dedupWinnowSql: String = {
    val gh = gramHashFoldSql((0 until WinnowK).map(i => s"lead(wh, $i) OVER byp"))
    s"""WITH wl AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
       |toks AS (
       |  SELECT doc_id, x AS pos, ${wordHashSql("wl[x+1]")} AS wh
       |  FROM wl, UNNEST(range(len(wl))) AS t(x)),
       |grams AS (
       |  SELECT doc_id, pos,
       |    $gh * ${1L << PosBits} + (${(1L << PosBits) - 1} - pos) AS key,
       |    lead(wh, ${WinnowK - 1}) OVER byp AS gn
       |  FROM toks
       |  WINDOW byp AS (PARTITION BY doc_id ORDER BY pos)),
       |sel AS (
       |  SELECT DISTINCT doc_id,
       |    CAST(selkey // ${1L << PosBits} AS BIGINT) AS fp
       |  FROM (
       |    SELECT doc_id,
       |      min(key) OVER frame AS selkey,
       |      count(*) OVER frame AS nw
       |    FROM (SELECT * FROM grams WHERE gn IS NOT NULL)
       |    WINDOW frame AS (PARTITION BY doc_id ORDER BY pos
       |                     ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING))
       |  WHERE nw = $WinnowW)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
       |FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "dedup_exact"                -> dedupExact,
    "dedup_substring_spans"      -> dedupSubstringSpans,
    "dedup_substring_spans_hashed" -> dedupSubstringSpansHashed,
    "dedup_contamination"        -> contaminationCheck,
    "dedup_contamination_bloom"  -> contaminationBloom,
    "dedup_ngram_jaccard"        -> dedupNgramJaccard,
    "dedup_ngram_jaccard_capped" -> dedupNgramJaccardCapped,
    "dedup_containment"          -> dedupContainment,
    "dedup_jaccard_prefix"       -> dedupJaccardPrefix,
    "dedup_novelty"              -> dedupNovelty,
    "dedup_minhash_lsh"          -> dedupMinhashLsh,
    "dedup_lsh_recall_eval"      -> lshRecallEval,
    "dedup_threshold_sweep"      -> dedupThresholdSweep,
    "dedup_crossmodal_audit"     -> dedupCrossmodalAudit,
    "dedup_simhash"              -> dedupSimhash,
    "dedup_clusters"             -> dedupClusters,
    "dedup_clusters_star"        -> dedupClustersStar,
    "dedup_keep_longest"         -> dedupKeepLongest,
    "dedup_savings"              -> dedupSavings,
    "dedup_incremental"          -> incrementalDelta,
    "doc_fingerprint"            -> docFingerprint,
    "dedup_winnow"               -> dedupWinnow,
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact"                -> dedupExactSql,
    "dedup_substring_spans"      -> dedupSubstringSpansSql,
    "dedup_substring_spans_hashed" -> dedupSubstringSpansHashedSql,
    "dedup_contamination"        -> contaminationCheckSql,
    "dedup_contamination_bloom"  -> contaminationBloomSql,
    "dedup_ngram_jaccard"        -> dedupNgramJaccardSql,
    "dedup_ngram_jaccard_capped" -> dedupNgramJaccardCappedSql,
    "dedup_containment"          -> dedupContainmentSql,
    "dedup_jaccard_prefix"       -> dedupJaccardPrefixSql,
    "dedup_novelty"              -> dedupNoveltySql,
    "dedup_minhash_lsh"          -> dedupMinhashLshSql,
    "dedup_lsh_recall_eval"      -> lshRecallEvalSql,
    "dedup_threshold_sweep"      -> dedupThresholdSweepSql,
    "dedup_crossmodal_audit"     -> dedupCrossmodalAuditSql,
    "dedup_simhash"              -> dedupSimhashSql,
    "dedup_clusters"             -> dedupClustersSql,
    "dedup_clusters_star"        -> dedupClustersStarSql,
    "dedup_keep_longest"         -> dedupKeepLongestSql,
    "dedup_savings"              -> dedupSavingsSql,
    "dedup_incremental"          -> incrementalDeltaSql,
    "doc_fingerprint"            -> docFingerprintSql,
    "dedup_winnow"               -> dedupWinnowSql,
  )

}
