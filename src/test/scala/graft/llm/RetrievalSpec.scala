package graft.llm

import graft.SparkTestBase

/** Semantic pins for the span-level dedup and phrase retrieval operators —
  * properties the DuckDB oracle can't articulate (it would just recompute
  * the same algebra): span MERGING (overlapping matched grams collapse to
  * one maximal span), sub-W-document totality, and phrase ADJACENCY
  * (scattered query words must not match). */
class RetrievalSpec extends SparkTestBase {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-retr").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("substring spans: a shared 12-token run is ONE span, not 5 grams") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, s"a1 a2 a3 a4 $shared b1 b2 b3 b4"),
      (2L, s"c1 c2 c3 c4 $shared d1 d2 d3 d4"),
      (3L, "tiny doc") // < W tokens: filtered, must not throw
    ))
    val out = Dedup.dedupSubstringSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L)) // doc 3 excluded, no crash
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      // 12-token run ⇒ 12-8+1 = 5 duplicated 8-gram starts, merged to 1 span
      assert(r.getLong(1) == 5L, s"doc $id n_dup_grams")
      assert(r.getLong(2) == 1L, s"doc $id n_spans")
      assert(r.getLong(3) == 12L, s"doc $id longest_span")
      assert(r.getLong(4) == 12L, s"doc $id dup_tokens")
      assert(math.abs(r.getDouble(5) - 12.0 / 20.0) < 1e-9, s"doc $id coverage")
    }
  }

  test("substring spans: two separated shared runs stay two spans") {
    val runA = (1 to 8).map(i => s"x$i").mkString(" ")
    val runB = (1 to 8).map(i => s"y$i").mkString(" ")
    // gap of 9 unique tokens (> W) between the runs ⇒ islands split
    val gap1 = (1 to 9).map(i => s"g$i").mkString(" ")
    val gap2 = (1 to 9).map(i => s"h$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, s"$runA $gap1 $runB"),
      (2L, s"$runB $gap2 $runA")))
    val out = Dedup.dedupSubstringSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getLong(2) == 2L, s"doc $id n_spans")
      assert(out(id).getLong(3) == 8L, s"doc $id longest_span")
    }
  }

  test("hashed-gram spans: collision check — hashed output ≡ string-gram output") {
    // The 44-bit gram fold may in principle collide (merging two distinct
    // grams identically in BOTH engines — the oracle still matches); this
    // pin certifies that on real test data no collision changes the
    // answer: the hashed variant must reproduce the string variant
    // row-for-row. Run on the sf0.001 corpus, not a toy fixture.
    val dir = "/root/testdata/sf0.001"
    val str = Dedup.dedupSubstringSpans(spark, dir).collect().toSeq
    val hsh = Dedup.dedupSubstringSpansHashed(spark, dir).collect().toSeq
    assert(str.nonEmpty, "corpus must produce duplicated spans")
    assert(hsh == str, "a gram-hash collision changed the span answer")
  }

  test("phrase search: adjacency required, occurrences counted, 1-based pos") {
    val dir = writeDocs(Seq(
      (1L, "slow hash batch q r slow hash batch"), // 2 hits, first at 1
      (2L, "slow x hash y batch"),                 // scattered: no hit
      (3L, "slow hash x batch"),                   // broken adjacency: no hit
      (4L, "pad slow hash batch")))                // 1 hit at pos 2
    val out = TextAnalysis.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (4L, 1L, 2L)))
  }

  test("winnowing: the w+k-1 shared-run guarantee holds; disjoint docs pair nothing") {
    // Schleimer et al.'s guarantee: any shared substring of ≥ w+k−1 = 8
    // tokens yields ≥ 1 shared selected fingerprint. Docs 1 and 2 share
    // TWO separated 12-token runs (≥ 2 shared fps expected, clearing the
    // pair threshold); docs 3 and 4 are token-disjoint from everything
    // and must not pair with anything.
    val runA = (1 to 12).map(i => s"s$i").mkString(" ")
    val runB = (1 to 12).map(i => s"t$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, s"a1 a2 a3 a4 $runA m1 m2 m3 m4 m5 m6 $runB z1 z2"),
      (2L, s"b1 b2 b3 b4 $runA n1 n2 n3 n4 n5 n6 $runB y1 y2"),
      (3L, (1 to 40).map(i => s"u$i").mkString(" ")),
      (4L, (1 to 40).map(i => s"v$i").mkString(" "))))
    val out = Dedup.dedupWinnow(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.keySet === Set((1L, 2L)), s"unexpected pairs: ${out.keySet}")
    assert(out((1L, 2L)) >= 2, "two shared 12-token runs must share ≥2 fingerprints")
  }
}
