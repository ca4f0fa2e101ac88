package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions.dotp
import graft.plans.TopKPerGroup

/** Product quantization (PQ) for embedding compression + approximate
  * search — the memory-side half of a production ANN stack (IVF in
  * [[Similarity]] is the partition-side half). 64-dim float vectors are
  * split into M=8 subspaces of 8 dims; each subvector is encoded as the
  * index of its nearest codebook centroid (K=4 per subspace), compressing
  * 256 bytes of floats to 8 small codes. Search uses asymmetric-distance
  * computation (ADC): the query precomputes one K-entry lookup table per
  * subspace, and each candidate's approximate distance is M table lookups
  * — no float math per candidate at all.
  *
  * The codebooks and the query vector are PORTABLE LITERALS (deterministic
  * formulas, not trained k-means): both the Spark expressions and the
  * DuckDB oracle inline the exact same decimal strings, so encode codes
  * and ADC sums are bit-identical across engines and the hash gate is
  * strict. (In production the codebook comes from a k-means fit and is
  * broadcast the same way — the plumbing, plan shape, and cost model here
  * are the real thing; only the centroid VALUES are synthetic.)
  *
  * Scale notes:
  *   - Encoding is map-only and scan-fused: per-row argmin over K literal
  *     centroids inside whole-stage codegen, no shuffle, no UDF.
  *   - ADC search is map-only over the encoded (tiny) representation plus
  *     one bounded TakeOrderedAndProject — the 100 TB plan touches the
  *     8-byte codes, not the 256-byte vectors.
  *   - Re-ranking re-reads exact vectors ONLY for the bounded shortlist
  *     (ADC top-50 → exact top-10), the standard recall-repair pattern:
  *     approximate first pass over everything, exact math over almost
  *     nothing.
  */
object ProductQuantization {

  type Q = (SparkSession, String) => DataFrame

  private val M = 8       // subspaces
  private val SubDim = 8  // dims per subspace (M * SubDim = 64)
  private val K = 4       // centroids per subspace

  private val centers = Array(-0.6, -0.2, 0.2, 0.6)

  /** Codebook centroid value for (subspace s, code c, local dim d) —
    * a fixed portable formula, identical in Spark and the oracle. */
  private def cb(s: Int, c: Int, d: Int): Double =
    centers(c) + 0.05 * (((s * SubDim + d) % 5) - 2)

  /** Fixed literal query vector for the ADC queries. */
  private def qv(dim: Int): Double = 0.1 * ((dim % 7) - 3)

  /** ADC lookup table: ||q_s − cb[s][c]||², computed once driver-side and
    * inlined as a literal on both engines. */
  private def lut(s: Int, c: Int): Double = {
    var acc = 0.0
    var d = 0
    while (d < SubDim) {
      val x = qv(s * SubDim + d) - cb(s, c, d)
      acc += x * x
      d += 1
    }
    acc
  }

  // ---- Spark side ---------------------------------------------------

  private def subDist(emb: Column, s: Int, c: Int): Column =
    (0 until SubDim).map { d =>
      val x = element_at(emb, s * SubDim + d + 1).cast("double") - lit(cb(s, c, d))
      x * x
    }.reduce(_ + _)

  /** Nearest-centroid code for subspace s: argmin over K distances with
    * lowest-code tie-break (expressed as a CASE so both engines evaluate
    * the identical comparison chain). */
  private def codeCol(emb: Column, s: Int): Column = {
    val dist = (0 until K).map(c => subDist(emb, s, c))
    when(dist(0) <= dist(1) && dist(0) <= dist(2) && dist(0) <= dist(3), 0)
      .when(dist(1) <= dist(2) && dist(1) <= dist(3), 1)
      .when(dist(2) <= dist(3), 2)
      .otherwise(3)
  }

  private def encoded(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir).embeddings
    emb.select(
      col("vec_id") +:
        (0 until M).map(sub => codeCol(col("embedding"), sub).as(s"code_$sub")): _*)
  }

  def vecPqEncode: Q = (s, dir) => encoded(s, dir).orderBy(col("vec_id"))

  private def adcCol: Column =
    (0 until M).map { sub =>
      val c = col(s"code_$sub")
      when(c === 0, lit(lut(sub, 0)))
        .when(c === 1, lit(lut(sub, 1)))
        .when(c === 2, lit(lut(sub, 2)))
        .otherwise(lit(lut(sub, 3)))
    }.reduce(_ + _)

  /** ADC top-n over the encoded representation — the rerank input and the
    * test hook for the shortlist-subset property. */
  private[llm] def adcShortlist(s: SparkSession, dir: String, n: Int): DataFrame =
    encoded(s, dir)
      .withColumn("adc_dist", adcCol)
      .select(col("vec_id"), col("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(n)

  def vecPqAdcTopK: Q = (s, dir) => adcShortlist(s, dir, 10)

  /** ADC shortlist (top-50 codes-only) → exact squared distance over the
    * full vectors for just those 50 → top-10. */
  def vecPqRerank: Q = (s, dir) => {
    val emb = Tables(s, dir).embeddings
    val shortlist = adcShortlist(s, dir, 50)
    val exact = (0 until M * SubDim).map { d =>
      val x = element_at(col("embedding"), d + 1).cast("double") - lit(qv(d))
      x * x
    }.reduce(_ + _)
    emb.join(broadcast(shortlist), "vec_id")
      .withColumn("exact_dist", exact)
      .select(col("vec_id"), col("exact_dist"))
      .orderBy(col("exact_dist"), col("vec_id"))
      .limit(10)
  }

  // ---- IVF-PQ: coarse cells + in-cell ADC over codes + exact re-rank --

  /** Inner-product ADC lookup entry for (query vn, subspace s, code c):
    * dot(q_s, cb[s][c]). Computed once per QUERY on the broadcast side —
    * per candidate the score is 8 CASE lookups, zero vector math. */
  private def lutIpCol(q: Column, s: Int, c: Int): Column =
    (0 until SubDim).map { d =>
      element_at(q, s * SubDim + d + 1) * lit(cb(s, c, d))
    }.reduce(_ + _)

  /** IVF-PQ — the FAISS IVFPQ composition of this module's PQ with
    * [[Similarity]]'s IVF. The coarse quantizer restricts each query to
    * its own cell (nprobe=1); within the cell, candidates are scored by
    * asymmetric distance over their 8 PQ codes (approximate cosine =
    * Σ_s dot(q_s, cb[s][code_s]), with the 32 per-query LUT entries
    * precomputed on the broadcast query side); the ADC top-10 shortlist
    * is re-ranked with exact dot products read ONLY for those ≤100 rows.
    *
    * Scale shape: the candidate join touches (vec_id, cell, 8 small
    * codes) per corpus row — never the 256-byte vectors — which is the
    * point of IVFPQ at 100 TB: cells bound the candidate count, codes
    * bound the bytes per candidate, and exact math happens on a
    * broadcast-sized shortlist. Top-k selection is the native
    * [[graft.plans.TopKPerGroup]] bounded heap (no Window, no partition
    * sort). The oracle runs the identical algorithm, so the entry is
    * strictly hash-gated despite being approximate. */
  def knnIvfPq: Q = (s, dir) => {
    val emb = Similarity.normalized(Tables(s, dir))
    val assigned = Similarity.ivfAssigned(emb, Similarity.ivfCentroids(emb))
    val codes = assigned.select(
      Seq(col("vec_id"), col("cell")) ++
        (0 until M).map(sub => codeCol(col("vn"), sub).as(s"code_$sub")): _*)
    val luts = for { sub <- 0 until M; c <- 0 until K }
      yield lutIpCol(col("vn"), sub, c).as(s"lut_${sub}_$c")
    val queries = broadcast(assigned.filter(col("vec_id") < 10)
      .select(Seq(col("vec_id").as("query_id"), col("vn").as("qv"), col("cell")) ++ luts: _*))
    val adcIp = (0 until M).map { sub =>
      val c = col(s"code_$sub")
      when(c === 0, col(s"lut_${sub}_0"))
        .when(c === 1, col(s"lut_${sub}_1"))
        .when(c === 2, col(s"lut_${sub}_2"))
        .otherwise(col(s"lut_${sub}_3"))
    }.reduce(_ + _)
    val cands = queries.join(codes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"),
        adcIp.as("adc_ip"))
    val shortlist = TopKPerGroup(cands, Seq("query_id"),
      Seq(("adc_ip", false), ("neighbor_id", true)), 10)
    val exact = emb.join(broadcast(shortlist), col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dotp(col("qv"), col("vn")).as("cos"))
    Similarity.topKRanked(exact, 3)
  }

  // ---- IVF-PQ with RESIDUAL encoding + multiprobe base term ----------

  /** IVF-PQ over RESIDUALS — the missing half of the FAISS IVFPQ recipe
    * ([[knnIvfPqTrained]] trains the books per cell; this entry encodes
    * what FAISS actually hands the books: the residual r = vn − cv(cell)
    * after the coarse quantizer). Residuals concentrate near the origin
    * regardless of where the cell sits in the embedding space, so a
    * single shared codebook quantizes them far better than raw vectors —
    * the reason every production IVFPQ index stores residual codes.
    *
    * Search is the true multiprobe ADC: dot(q, x) = dot(q, cv) +
    * dot(q, r), so each candidate scores as its cell's BASE term (exact,
    * per probed cell — this is what makes candidates comparable ACROSS
    * the nprobe=2 probed cells; at nprobe=1 it would cancel in ranking)
    * plus the 8-lookup LUT sum over its residual codes. Codes-only join,
    * bounded-heap shortlist, exact rerank over the broadcast-sized
    * shortlist — the knnIvfPq scale shape with strictly better
    * quantization. Every arithmetic step (elementwise residual, dot
    * folds, CASE chains, left-to-right ADC sum) replays identically in
    * the oracle, so the entry is hash-gated. */
  def knnIvfPqResidual: Q = (s, dir) => {
    val emb = Similarity.normalized(Tables(s, dir))
    val cents = Similarity.ivfCentroids(emb)
    val assigned = Similarity.ivfAssigned(emb, cents)
    // Residual per member, quantized by the SHARED literal codebook.
    val codes = assigned
      .join(cents, col("cell") === col("cent_id"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("vn"), col("cv"), (a, b) => a - b).as("rv"))
      .select(Seq(col("vec_id"), col("cell")) ++
        (0 until M).map(sub => codeCol(col("rv"), sub).as(s"code_$sub")): _*)
    // nprobe=2 probes; each carries its cell's exact base term and the
    // query's 32 LUT entries (all broadcast-sized).
    val probeScores = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"))
      .join(cents)
      .select(col("query_id"), col("qv"), col("cent_id"),
        dotp(col("qv"), col("cv")).as("cs"))
    val luts = for { sub <- 0 until M; c <- 0 until K }
      yield lutIpCol(col("qv"), sub, c).as(s"lut_${sub}_$c")
    val probes = broadcast(
      TopKPerGroup(probeScores, Seq("query_id"), Seq(("cs", false), ("cent_id", true)), 2)
        .select(Seq(col("query_id"), col("qv"), col("cent_id").as("cell"),
          col("cs").as("base")) ++ luts: _*))
    val adcIp = (0 until M).map { sub =>
      val c = col(s"code_$sub")
      when(c === 0, col(s"lut_${sub}_0"))
        .when(c === 1, col(s"lut_${sub}_1"))
        .when(c === 2, col(s"lut_${sub}_2"))
        .otherwise(col(s"lut_${sub}_3"))
    }.foldLeft(col("base"))(_ + _)
    val cands = probes.join(codes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"),
        adcIp.as("adc_ip"))
    val shortlist = TopKPerGroup(cands, Seq("query_id"),
      Seq(("adc_ip", false), ("neighbor_id", true)), 10)
    val exact = emb.join(broadcast(shortlist), col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dotp(col("qv"), col("vn")).as("cos"))
    Similarity.topKRanked(exact, 3)
  }

  /** Oracle for [[knnIvfPqResidual]] — identical residuals (elementwise
    * vn − cv), identical codes, identical base + LUT ADC fold. */
  val knnIvfPqResidualSql: String = {
    val codeCols = (0 until M).map(s => s"${sqlCodeOn("rv", s)} AS code_$s").mkString(",\n")
    def lutIpSql(s: Int, c: Int): String =
      (0 until SubDim).map { d =>
        val i = s * SubDim + d + 1
        s"p.qv[$i] * (${cb(s, c, d)})"
      }.mkString(" + ")
    val adc = (0 until M).map { s =>
      s"""CASE WHEN a.code_$s = 0 THEN (${lutIpSql(s, 0)})
         |     WHEN a.code_$s = 1 THEN (${lutIpSql(s, 1)})
         |     WHEN a.code_$s = 2 THEN (${lutIpSql(s, 2)})
         |     ELSE (${lutIpSql(s, 3)}) END""".stripMargin
    }.mkString(" + ")
    s"""WITH ${Similarity.normalizedSql},
       |${Similarity.assignedCtesSql},
       |res AS (
       |  SELECT a.vec_id, a.cell,
       |    list_transform(range(1, ${M * SubDim + 1}), j -> a.vn[j] - c.cv[j]) AS rv
       |  FROM assigned a JOIN c ON a.cell = c.cent_id),
       |codes AS (SELECT vec_id, cell, $codeCols FROM res),
       |p AS (
       |  SELECT query_id, qv, cell, base FROM (
       |    SELECT e.vec_id AS query_id, e.vn AS qv, c.cent_id AS cell,
       |      list_dot_product(e.vn, c.cv) AS base,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_dot_product(e.vn, c.cv) DESC, c.cent_id) AS rn
       |    FROM e CROSS JOIN c WHERE e.vec_id < 10) t WHERE rn <= 2),
       |cands AS (
       |  SELECT p.query_id, p.qv, a.vec_id AS neighbor_id,
       |    p.base + $adc AS adc_ip
       |  FROM p JOIN codes a ON p.cell = a.cell AND a.vec_id <> p.query_id),
       |shortlist AS (
       |  SELECT query_id, qv, neighbor_id FROM (
       |    SELECT query_id, qv, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adc_ip DESC, neighbor_id) AS rn
       |    FROM cands) t WHERE rn <= 10)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM (
       |  SELECT s.query_id, s.neighbor_id,
       |    ROUND(list_dot_product(s.qv, e.vn), 9) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY list_dot_product(s.qv, e.vn) DESC, s.neighbor_id) AS rank
       |  FROM shortlist s JOIN e ON e.vec_id = s.neighbor_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  // ---- IVF-PQ over TRAINED cells + per-cell retrained codebooks ------

  /** IVF-PQ with BOTH stages trained (the full FAISS recipe, closing the
    * r10 note that PQ composed only with the deterministic grid cells):
    * the coarse quantizer is the k-means-trained cell set
    * ([[Similarity.kmeansCentroids]], 3 unrolled Lloyd iterations), and
    * the PQ codebooks are RETRAINED PER CELL — one Lloyd refinement of
    * the global literal codebook against each cell's own members (dim-
    * wise member means per (cell, subspace, initial code); a code unused
    * in a cell simply drops out of that cell's book). Residual-style
    * per-cell books track the local distribution, which is why real
    * IVFPQ trains per-list codebooks.
    *
    * Search keeps the [[knnIvfPq]] discipline: per-query inner-product
    * LUTs over its own cell's retrained book (≤ queries×M×K rows,
    * BROADCAST), candidates joined CODES-ONLY (cell, sub, code — never a
    * vector) with the ADC sum folded in DECIMAL(18,9) so the 8-term
    * accumulation is merge-order-independent and bit-equal cross-engine,
    * bounded-heap shortlist, exact rerank over ≤100 broadcast rows.
    *
    * Scale shape: retraining is one aggregate over the codes relation
    * (map-side combinable; output k·M·K·SubDim doubles — broadcast-sized
    * at any corpus size); re-encoding joins members to their OWN cell's
    * ≤K book rows per subspace (fan-out ≤K, argmax via max_by partial
    * aggregation, no window); the per-candidate search cost stays 8
    * integer lookups. The oracle replays the identical algebra. */
  def knnIvfPqTrained: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val emb = Similarity.normalized(Tables(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = Similarity.kmeansAssign(emb, Similarity.kmeansCentroids(emb))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Long-form initial codes from the global literal codebook: one row
    // per (member, subspace) carrying only the 8-dim subvector. ONE scan
    // + ONE generator (an array of per-subspace structs exploded), not an
    // 8-way union — the union form duplicated the 256-term code CASE
    // trees into every branch and Catalyst spent ~10 s/run just
    // optimizing the plan (measured at sf0.001).
    val code0l = assigned.select(col("vec_id"), col("cell"),
        explode(array((0 until M).map { sub =>
          struct(lit(sub).as("sub"), codeCol(col("vn"), sub).as("code"),
            slice(col("vn"), sub * SubDim + 1, SubDim).as("sv"))
        }: _*)).as("x"))
      .select(col("vec_id"), col("cell"), col("x.sub").as("sub"),
        col("x.code").as("code"), col("x.sv").as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Per-(cell, subspace, code) retrained centroid: dim-wise member
    // means, round-6 quantized (the kmeansUpdate discipline) so both
    // engines hold the identical book. SubDim is a static 8, so the
    // dim means are EIGHT sum columns in ONE partial-aggregated groupBy
    // — not a posexplode (×8 shuffle-row fanout) plus a second shuffle
    // to collect_list the dims back (the r15 shape; 2 shuffles → 1,
    // 1/8th the shuffled rows).
    val cb1 = code0l
      .groupBy(col("cell"), col("sub"), col("code"))
      .agg(count(lit(1)).as("n"),
        (1 to SubDim).map(j => sum(element_at(col("sv"), j)).as(s"s$j")): _*)
      .select(col("cell"), col("sub"), col("code"),
        array((1 to SubDim).map(j => round(col(s"s$j") / col("n"), 6)): _*).as("cv8"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Re-encode each member against ITS cell's retrained book: argmin of
    // ||sv − cv8||² ≡ argmax of dot(sv, cv8) − ½·dot(cv8, cv8) — both
    // dot products are the shared exact fold, and the argmax is a
    // max_by partial aggregation (no window, fan-out ≤ K).
    val code1 = code0l
      .join(cb1.withColumnRenamed("code", "cand"), Seq("cell", "sub"))
      .select(col("vec_id"), col("cell"), col("sub"), col("cand"),
        (dotp(col("sv"), col("cv8")) - lit(0.5) * dotp(col("cv8"), col("cv8"))).as("sc"))
      .groupBy(col("vec_id"), col("cell"), col("sub"))
      .agg(max_by(col("cand"), struct(col("sc"), -col("cand"))).as("code"))
    // Per-query LUT over its own cell's book (nprobe=1), broadcast.
    val queries = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vn").as("qv"), col("cell"))
    val lut = broadcast(queries.join(cb1, Seq("cell"))
      .select(col("query_id"), col("cell"), col("sub"), col("code"),
        round(dotp(slice(col("qv"), col("sub") * lit(SubDim) + lit(1), lit(SubDim)),
          col("cv8")), 9).as("l")))
    val adc = lut.join(code1, Seq("cell", "sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("l").cast(DecimalType(18, 9))).as("adcq"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adcq").cast("double").as("adc_ip"))
    val shortlist = TopKPerGroup(adc, Seq("query_id"),
      Seq(("adc_ip", false), ("neighbor_id", true)), 10)
      .select(col("query_id"), col("neighbor_id"))
    val exact = emb
      .join(broadcast(shortlist), col("vec_id") === col("neighbor_id"))
      .join(broadcast(queries.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), dotp(col("qv"), col("vn")).as("cos"))
    Similarity.topKRanked(exact, 3)
  }

  /** Oracle for [[knnIvfPqTrained]]: identical algebra in DuckDB — same
    * trained cells (shared k-means CTEs), same per-cell book retrain
    * (round-6 dim means), same argmax re-encode, same decimal-folded ADC,
    * same shortlist and exact rerank. */
  val knnIvfPqTrainedSql: String = {
    val codeCols = (0 until M).map(s => s"${sqlCodeOn("vn", s)} AS code_$s").mkString(",\n")
    val unions = (0 until M).map { sub =>
      s"""SELECT vec_id, cell, $sub AS sub, code_$sub AS code,
         |  list_slice(vn, ${sub * SubDim + 1}, ${(sub + 1) * SubDim}) AS sv FROM pqw""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${Similarity.normalizedSql},
       |${Similarity.kmeansCtesSql},
       |pqw AS (SELECT vec_id, cell, vn, $codeCols FROM af),
       |pql AS (
       |$unions),
       |pqbd AS (
       |  SELECT cell, sub, code, j, ROUND(SUM(sv[j]) / COUNT(*), 6) AS m
       |  FROM pql, UNNEST(generate_series(1, $SubDim)) AS u(j)
       |  GROUP BY cell, sub, code, j),
       |pqb AS (
       |  SELECT cell, sub, code, list(m ORDER BY j) AS cv8
       |  FROM pqbd GROUP BY cell, sub, code),
       |pqc AS (
       |  SELECT vec_id, cell, sub, cand AS code FROM (
       |    SELECT m.vec_id, m.cell, m.sub, b.code AS cand,
       |      ROW_NUMBER() OVER (PARTITION BY m.vec_id, m.sub ORDER BY
       |        list_dot_product(m.sv, b.cv8)
       |          - 0.5 * list_dot_product(b.cv8, b.cv8) DESC, b.code) AS rn
       |    FROM pql m JOIN pqb b ON m.cell = b.cell AND m.sub = b.sub) t
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, vn AS qv, cell FROM af WHERE vec_id < 10),
       |lut AS (
       |  SELECT q.query_id, q.cell, b.sub, b.code,
       |    ROUND(list_dot_product(
       |      list_slice(q.qv, b.sub * $SubDim + 1, (b.sub + 1) * $SubDim), b.cv8), 9) AS l
       |  FROM q JOIN pqb b ON q.cell = b.cell),
       |adc AS (
       |  SELECT l.query_id, c.vec_id AS neighbor_id,
       |    CAST(SUM(CAST(l.l AS DECIMAL(18,9))) AS DOUBLE) AS adc_ip
       |  FROM lut l JOIN pqc c ON l.cell = c.cell AND l.sub = c.sub AND l.code = c.code
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adc_ip DESC, neighbor_id) AS rn
       |    FROM adc) t WHERE rn <= 10)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM (
       |  SELECT s.query_id, s.neighbor_id,
       |    ROUND(list_dot_product(q.qv, e.vn), 9) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY list_dot_product(q.qv, e.vn) DESC, s.neighbor_id) AS rank
       |  FROM shortlist s JOIN e ON e.vec_id = s.neighbor_id
       |  JOIN q ON s.query_id = q.query_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  // ---- Oracle side (same literals, same operation order) -------------

  private def sqlSubDistOn(v: String, s: Int, c: Int): String =
    (0 until SubDim).map { d =>
      val i = s * SubDim + d + 1
      s"(CAST($v[$i] AS DOUBLE) - (${cb(s, c, d)})) * (CAST($v[$i] AS DOUBLE) - (${cb(s, c, d)}))"
    }.mkString(" + ")

  private def sqlSubDist(s: Int, c: Int): String = sqlSubDistOn("embedding", s, c)

  private def sqlCodeOn(v: String, s: Int): String = {
    val d = (0 until K).map(c => s"(${sqlSubDistOn(v, s, c)})")
    s"""CASE WHEN ${d(0)} <= ${d(1)} AND ${d(0)} <= ${d(2)} AND ${d(0)} <= ${d(3)} THEN 0
       |     WHEN ${d(1)} <= ${d(2)} AND ${d(1)} <= ${d(3)} THEN 1
       |     WHEN ${d(2)} <= ${d(3)} THEN 2 ELSE 3 END""".stripMargin
  }

  private def sqlCode(s: Int): String = sqlCodeOn("embedding", s)

  private val sqlEncoded: String =
    s"""SELECT vec_id, ${(0 until M).map(s => s"${sqlCode(s)} AS code_$s").mkString(",\n")}
       |FROM embeddings""".stripMargin

  /** LUT literals must be CAST to DOUBLE: DuckDB parses a bare decimal
    * literal as DECIMAL and would sum the CASE chain in decimal
    * arithmetic — off by an ulp from Spark's double left-fold. */
  private def sqlAdc: String =
    (0 until M).map { sub =>
      s"""CASE WHEN code_$sub = 0 THEN CAST(${lut(sub, 0)} AS DOUBLE)
         |     WHEN code_$sub = 1 THEN CAST(${lut(sub, 1)} AS DOUBLE)
         |     WHEN code_$sub = 2 THEN CAST(${lut(sub, 2)} AS DOUBLE)
         |     ELSE CAST(${lut(sub, 3)} AS DOUBLE) END""".stripMargin
    }.mkString(" + ")

  val vecPqEncodeSql: String =
    s"""SELECT * FROM ($sqlEncoded) ORDER BY vec_id""".stripMargin

  val vecPqAdcTopKSql: String =
    s"""SELECT vec_id, $sqlAdc AS adc_dist
       |FROM ($sqlEncoded)
       |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin

  val vecPqRerankSql: String = {
    val exact = (0 until M * SubDim).map { d =>
      val i = d + 1
      s"(CAST(e.embedding[$i] AS DOUBLE) - (${qv(d)})) * (CAST(e.embedding[$i] AS DOUBLE) - (${qv(d)}))"
    }.mkString(" + ")
    s"""WITH shortlist AS (
       |  SELECT vec_id, $sqlAdc AS adc_dist
       |  FROM ($sqlEncoded)
       |  ORDER BY adc_dist, vec_id LIMIT 50)
       |SELECT e.vec_id, $exact AS exact_dist
       |FROM embeddings e JOIN shortlist s ON e.vec_id = s.vec_id
       |ORDER BY exact_dist, e.vec_id LIMIT 10""".stripMargin
  }

  /** Oracle for [[knnIvfPq]]: the identical IVF-PQ algorithm in DuckDB —
    * same normalized vectors, same assigned cells, same PQ codes over vn,
    * same per-query inner-product LUTs, same ADC CASE chain, same
    * shortlist and exact re-rank. */
  val knnIvfPqSql: String = {
    val codeCols = (0 until M).map(s => s"${sqlCodeOn("vn", s)} AS code_$s").mkString(",\n")
    def lutIpSql(s: Int, c: Int): String =
      (0 until SubDim).map { d =>
        val i = s * SubDim + d + 1
        s"q.vn[$i] * (${cb(s, c, d)})"
      }.mkString(" + ")
    val adc = (0 until M).map { s =>
      s"""CASE WHEN a.code_$s = 0 THEN (${lutIpSql(s, 0)})
         |     WHEN a.code_$s = 1 THEN (${lutIpSql(s, 1)})
         |     WHEN a.code_$s = 2 THEN (${lutIpSql(s, 2)})
         |     ELSE (${lutIpSql(s, 3)}) END""".stripMargin
    }.mkString(" + ")
    s"""WITH ${Similarity.normalizedSql},
       |${Similarity.assignedCtesSql},
       |codes AS (SELECT vec_id, cell, $codeCols FROM assigned),
       |cands AS (
       |  SELECT q.vec_id AS query_id, q.vn AS qv, a.vec_id AS neighbor_id,
       |    $adc AS adc_ip
       |  FROM assigned q JOIN codes a ON q.cell = a.cell AND a.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |shortlist AS (
       |  SELECT query_id, qv, neighbor_id FROM (
       |    SELECT query_id, qv, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adc_ip DESC, neighbor_id) AS rn
       |    FROM cands) t WHERE rn <= 10)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM (
       |  SELECT s.query_id, s.neighbor_id,
       |    ROUND(list_dot_product(s.qv, e.vn), 9) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY list_dot_product(s.qv, e.vn) DESC, s.neighbor_id) AS rank
       |  FROM shortlist s JOIN e ON e.vec_id = s.neighbor_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "vec_pq_encode"   -> vecPqEncode,
    "vec_pq_adc_topk" -> vecPqAdcTopK,
    "vec_pq_rerank"   -> vecPqRerank,
    "knn_ivfpq"       -> knnIvfPq,
    "knn_ivfpq_trained" -> knnIvfPqTrained,
    "knn_ivfpq_residual" -> knnIvfPqResidual,
  )

  val oracles: Map[String, String] = Map(
    "vec_pq_encode"   -> vecPqEncodeSql,
    "vec_pq_adc_topk" -> vecPqAdcTopKSql,
    "vec_pq_rerank"   -> vecPqRerankSql,
    "knn_ivfpq"       -> knnIvfPqSql,
    "knn_ivfpq_trained" -> knnIvfPqTrainedSql,
    "knn_ivfpq_residual" -> knnIvfPqResidualSql,
  )
}
