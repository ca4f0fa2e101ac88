package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable arithmetic text hashing, expressed twice in lockstep: once as
  * Spark `Column` trees (whole-stage-codegen friendly — no UDFs) and once
  * as ANSI SQL strings for the DuckDB oracle. Every operation is exact
  * 64-bit integer arithmetic (or IEEE ops that are bit-identical across
  * engines: division by powers of two, floor), so signatures match across
  * engines bit-for-bit.
  *
  * In production the word/shingle hash would be `xxhash64` (Spark-native,
  * codegen'd); it is a drop-in replacement here — the polynomial hash
  * exists so the *oracle* can recompute signatures independently. The
  * MinHash/SimHash/LSH structure on top is the real, scale-relevant part:
  * explode → hash → min-aggregate is one map-side-combinable aggregation,
  * and banding turns O(n²) candidate search into an equi-join groupable
  * shuffle — the standard 100 TB dedup shape.
  */
object TextHash {

  /** 2^31 - 1 (prime), the modulus for all polynomial/affine hashes. */
  val M: Long = 2147483647L

  private val pow31: Array[Long] = Iterator.iterate(1L)(_ * 31).take(8).toArray

  /** Polynomial word hash over the first 8 chars + length, mod M.
    * ascii('') = 0 in both engines, so short words degrade consistently. */
  def wordHashCol(w: Column): Column = {
    val terms = (0 until 8).map(i => ascii(substring(w, i + 1, 1)) * lit(pow31(i)))
    (terms.reduce(_ + _) + length(w)) % lit(M)
  }

  def wordHashSql(w: String): String = {
    // CAST to BIGINT: DuckDB would otherwise multiply in INT32 and overflow.
    val terms = (0 until 8).map(i =>
      s"CAST(ascii(substr($w, ${i + 1}, 1)) AS BIGINT) * ${pow31(i)}")
    s"((${terms.mkString(" + ")} + length($w)) % $M)"
  }

  /** Combine three word hashes into a shingle hash, mod M. */
  def shingleHashCol(w1: Column, w2: Column, w3: Column): Column =
    (wordHashCol(w1) + wordHashCol(w2) * lit(7919L) + wordHashCol(w3) * lit(104729L)) % lit(M)

  def shingleHashSql(w1: String, w2: String, w3: String): String =
    s"((${wordHashSql(w1)} + ${wordHashSql(w2)} * 7919 + ${wordHashSql(w3)} * 104729) % $M)"

  /** MinHash affine family h_i(x) = (a_i * x + b_i) mod M. Constants are
    * arbitrary odd multipliers; a_i * x < 2^62 stays in int64. */
  val NumHashes = 16
  val A: Array[Long] = Array(
    1103515245L, 134775813L, 69069L, 1664525L, 22695477L, 214013L,
    1103515213L, 75617291L, 48271L, 16807L, 742938285L, 950706376L,
    1226874159L, 62089911L, 72057594L, 279470273L)
  val B: Array[Long] = Array(
    12345L, 1L, 5L, 1013904223L, 1L, 2531011L, 12347L, 7L, 3L, 17L,
    23L, 31L, 41L, 59L, 67L, 83L)

  def minhashCol(sh: Column, i: Int): Column = (lit(A(i)) * sh + lit(B(i))) % lit(M)
  def minhashSql(sh: String, i: Int): String = s"((${A(i)} * $sh + ${B(i)}) % $M)"

  /** LSH band key over a minhash signature array: r=2 rows per band. */
  val NumBands = 8
  def bandHashCol(mh0: Column, mh1: Column): Column = (mh0 * lit(31L) + mh1) % lit(M)
  def bandHashSql(mh0: String, mh1: String): String = s"(($mh0 * 31 + $mh1) % $M)"

  /** 32-bit multiplicative spread of a word hash for SimHash bit sampling:
    * g = (wh * 2654435761) mod 2^32. Bit b is floor(g / 2^b) mod 2 —
    * division by a power of two is an exponent shift, exact in IEEE, so
    * identical in both engines. */
  val SimBits = 32
  def spreadCol(wh: Column): Column = (wh * lit(2654435761L)) % lit(4294967296L)
  def spreadSql(wh: String): String = s"(($wh * 2654435761) % 4294967296)"

  def bitCol(g: Column, b: Int): Column =
    floor(g / lit(math.pow(2, b))).cast("long") % 2
  def bitSql(g: String, b: Int): String =
    s"(CAST(FLOOR($g / ${1L << b}.0) AS BIGINT) % 2)"

  /** Positional fingerprint term: (wh mod M) * (((pos+1) * 2654435761) mod M) mod M.
    * Summed over positions (order-sensitive → a true document fingerprint),
    * the running total stays < 2^41 * n_words, safely inside int64. */
  def fpTermCol(wh: Column, pos: Column): Column =
    (wh % lit(M)) * (((pos + 1) * lit(2654435761L)) % lit(M)) % lit(M)
  def fpTermSql(wh: String, pos: String): String =
    s"(((($wh) % $M) * ((($pos + 1) * 2654435761) % $M)) % $M)"

  /** Horner-fold of W word hashes into one GRAM hash, mod 2^44 — the
    * 8-bytes-for-50 swap the substring dedup's wide shuffle wants. The
    * 44-bit space keeps the fold in int64 (h*31 + wh < 2^50) while
    * pushing the birthday collision expectation for ~10⁶ distinct grams
    * below 0.01; a collision merges two distinct grams IDENTICALLY in
    * both engines (the oracle recomputes the same fold), and the
    * collision-check spec compares hashed vs string-gram output. In
    * production this is `xxhash64(gram)` — drop-in, same shuffle shape. */
  val GramM: Long = 1L << 44
  def gramHashCol(words: Seq[Column]): Column =
    gramHashFoldCol(words.map(wordHashCol))
  def gramHashSql(words: Seq[String]): String =
    gramHashFoldSql(words.map(wordHashSql))

  /** The fold over ALREADY-COMPUTED word hashes — callers that can hash
    * each token once (a token rides up to W grams) use this directly. */
  def gramHashFoldCol(hashes: Seq[Column]): Column =
    hashes.foldLeft(lit(0L): Column)((h, wh) => (h * lit(31L) + wh) % lit(GramM))
  def gramHashFoldSql(hashes: Seq[String]): String =
    hashes.foldLeft("0")((h, wh) => s"(($h * 31 + $wh) % $GramM)")
}
