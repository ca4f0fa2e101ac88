package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Edge-case coverage for the per-row text-quality operators: the oracle
  * fixtures (driver `documents` table) never go below 10 words, but at
  * 100 TB empty and single-word documents are routine and must not kill
  * the stage. */
class TextAnalysisSpec extends SparkTestBase {

  private lazy val shortDocsDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdocs").toString
    Seq(
      (1L, ""),                   // split ⇒ [""], 1 "word"
      (2L, "lonely"),             // 1 word, no bigrams
      (3L, "a b a b"),            // repeated bigram
      (4L, "s t u v w x y z zz")  // 9 distinct words: 1/9 ≤ 0.12 ⇒ keep
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetitionFilter is total on empty and 1-word documents") {
    val rows = TextAnalysis.repetitionFilter(spark, shortDocsDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 4)
    // <2 words: bigram fraction is NULL (DuckDB range(len-1) is empty),
    // word fractions still defined.
    for (id <- Seq(1L, 2L)) {
      val r = rows(id)
      assert(r.getLong(1) == 1L, s"doc $id n_words")
      assert(r.getDouble(2) == 1.0, s"doc $id top_word_frac")
      assert(r.isNullAt(4), s"doc $id dup_bigram_frac should be NULL")
    }
    // "a b a b": bigrams [a b, b a, a b] ⇒ 1 duplicate of 3.
    val r3 = rows(3L)
    assert(r3.getLong(1) == 4L)
    assert(math.abs(r3.getDouble(4) - 1.0 / 3.0) < 1e-12)
    assert(!r3.getBoolean(5)) // top_word_frac 0.5 > 0.12 ⇒ drop
    // all-distinct doc keeps.
    val r4 = rows(4L)
    assert(r4.getDouble(3) == 0.0 && r4.getDouble(4) == 0.0 && r4.getBoolean(5))
  }

  test("chunkPack handles documents shorter than one chunk") {
    val out = TextAnalysis.chunkPack(spark, shortDocsDir).collect()
    // Every doc yields at least its first (possibly partial) chunk.
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L))
    assert(byDoc.values.forall(_.length == 1))
  }
}
