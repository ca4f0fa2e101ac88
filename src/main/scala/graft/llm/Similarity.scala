package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Vector similarity search over the `embeddings` table
  * (embedding: array<float>, 64-dim).
  *
  * Scale design:
  *   - Brute-force top-k: broadcast the (small) query set, scan the corpus
  *     once, per-partition ranking then a (query, rank) window. Linear in
  *     corpus size, embarrassingly parallel — the correct exact baseline
  *     at any scale; 100 TB of vectors stream through executors with only
  *     k rows per query surviving per partition.
  *   - IVF: deterministic coarse quantizer (every 25th vector is a
  *     centroid), assign each vector to its nearest centroid (broadcast
  *     join against ≤ a few thousand centroids), then search only the
  *     query's cell (nprobe=1). This is the standard sub-linear ANN shape:
  *     the expensive part becomes an equi-join on cell id.
  *
  * All dot products are computed in double (floats widened first — Spark
  * would otherwise multiply in float while DuckDB's list_dot_product works
  * in double) via zip_with + aggregate, a sequential left fold that
  * matches DuckDB's evaluation order bit-for-bit. Cosine values are
  * emitted rounded to 9 decimals to absorb any last-ulp divergence.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  /** Sequential-fold dot product of two double arrays. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private val cosineSql: String =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

  /** Exact top-k cosine neighbors for the first 10 vectors (query set). */
  def knnBruteForce: Q = (s, dir) => {
    val emb = Tables(s, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val scored = queries.join(emb, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 9).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val knnBruteForceSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ROUND($cosineSql, 9) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |                       ORDER BY $cosineSql DESC, b.vec_id) AS rank
       |  FROM e a JOIN e b ON a.vec_id < 10 AND b.vec_id <> a.vec_id) t
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF (nprobe=1): deterministic centroids, cell assignment by nearest
    * centroid, search restricted to the query's cell. */
  def knnIvf: Q = (s, dir) => {
    val emb = Tables(s, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val centroids = broadcast(emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    // Nearest centroid per vector: small broadcast join + window argmin.
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cs").desc, col("cent_id"))
    val assigned = emb.join(centroids)
      .select(col("vec_id"), col("v"), col("cent_id"), cosine(col("v"), col("cv")).as("cs"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val queries = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    val scored = queries.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 9).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val knnIvfSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 25 = 0),
       |assigned AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_dot_product(e.v, c.cv) /
       |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
       |          c.cent_id) AS rn
       |    FROM e CROSS JOIN c) t WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, cell FROM assigned WHERE vec_id < 10)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |    ROUND(list_dot_product(q.qv, a.v) /
       |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))), 9) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_id
       |      ORDER BY list_dot_product(q.qv, a.v) /
       |        (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))) DESC,
       |        a.vec_id) AS rank
       |  FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.query_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs (the "semantic dedup" op):
    * all pairs above a high cosine threshold, via the same broadcast-able
    * self-join; at scale the corpus side would be LSH-bucketed first. */
  def embeddingNearDup: Q = (s, dir) => {
    val emb = Tables(s, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= 0.45)
      .select(col("v1"), col("v2"), round(col("cos"), 9).as("cos_sim"))
      .orderBy(col("v1"), col("v2"))
  }

  val embeddingNearDupSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS v1, b.vec_id AS v2, ROUND($cosineSql, 9) AS cos_sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE $cosineSql >= 0.45
       |ORDER BY v1, v2""".stripMargin

  val queries: Map[String, Q] = Map(
    "knn_brute_force"    -> knnBruteForce,
    "knn_ivf"            -> knnIvf,
    "embedding_near_dup" -> embeddingNearDup,
  )

  val oracles: Map[String, String] = Map(
    "knn_brute_force"    -> knnBruteForceSql,
    "knn_ivf"            -> knnIvfSql,
    "embedding_near_dup" -> embeddingNearDupSql,
  )
}
