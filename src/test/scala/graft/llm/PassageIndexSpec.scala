package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.functions._

/** Passage retrieval served FROM the persisted index (verdict-r16 Next
  * #6): the chunk-grain posting table rides the same build + WAP
  * maintenance transactions as the document-grain tables, and
  * max-passage BM25 serves from probed term buckets — bit-identical to
  * the in-query [[TextAnalysis.passageBm25]] entry, partition-pruned,
  * and exact through append AND delete. */
class PassageIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def fmt = classOf[ManifestFileSink].getName
  private val terms = Seq("dup", "spark", "window")

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-passage-idx").toString
    TextIndex.build(spark, sf, p)
    p
  }

  test("served max-passage ranking is bit-identical to the in-query entry") {
    val got = TextIndex.servePassages(spark, path, terms).collect().toSeq
    val want = TextAnalysis.passageBm25(spark, sf).collect().toSeq
    assert(got === want)
  }

  test("passage serve opens ONLY the probed buckets' files") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = TextIndex.servePassages(spark, path, terms)
      assert(served.collect().nonEmpty)
      val scans = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
        .filter(b => b.scan.description.contains("passages") &&
          b.scan.description.contains("In(tb"))
      assert(scans.nonEmpty,
        "expected the probed-bucket IN filter pushed to the passages scan")
      val nBuckets = spark.read.format(fmt)
        .option("path", s"$path/passages").load()
        .select(col("tb")).distinct().count()
      val fetch = scans.head
      val read = fetch.metrics("filesRead").value
      val pruned = fetch.metrics("filesPruned").value
      assert(read + pruned === nBuckets,
        s"read($read) + pruned($pruned) must cover all $nBuckets bucket files")
      assert(read <= 3, s"three terms probe at most three buckets (read=$read)")
      assert(read < nBuckets, "the fetch must not open every bucket")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("maintained base: append + delete keep passage serve ≡ rebuild over survivors") {
    val dir = {
      val d = Files.createTempDirectory("graft-passage-dir").toString
      for (t <- Seq("documents", "embeddings"))
        spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
      d
    }
    val base = IndexMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-passage-base").toString)
    IndexMaintenance.ingestAppend(spark, base,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 === 6))
    val tp = IndexMaintenance.textPath(base)
    // After the append: maintained passage serve ≡ rebuild over %13 ≠ 5.
    val full = Files.createTempDirectory("graft-passage-full").toString
    TextIndex.buildFrom(spark,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 =!= 5),
      s"$dir/documents.parquet", full)
    assert(TextIndex.servePassages(spark, tp, terms).collect().toSeq ===
      TextIndex.servePassages(spark, full, terms).collect().toSeq)
    // After the delete: negative pstats/pdfparts rows fold and the
    // masked chunk rows vanish — serve ≡ rebuild over survivors.
    assert(IndexMaintenance.deleteRange(spark, base, 100L, 300L) > 0)
    val surv = Files.createTempDirectory("graft-passage-surv").toString
    TextIndex.buildFrom(spark,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 13 =!= 5 &&
          !(col("doc_id") >= 100 && col("doc_id") < 300)),
      s"$dir/documents.parquet", surv)
    assert(TextIndex.servePassages(spark, tp, terms).collect().toSeq ===
      TextIndex.servePassages(spark, surv, terms).collect().toSeq)
  }
}
