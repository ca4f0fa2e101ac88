package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.functions._

/** The persisted-postings contract: build once into the term-bucketed
  * layout, serve by opening ONLY the probed buckets' files, return
  * exactly the in-query BM25 entry's answers, refuse staleness. */
class TextIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-textindex").toString
    TextIndex.build(spark, sf, p)
    p
  }

  test("build demuxes one single-bucket data file per term bucket") {
    val files = spark.read.format(classOf[ManifestFileSink].getName)
      .option("path", s"$path/postings").load()
      .groupBy(col("_file"))
      .agg(countDistinct(col("tb")).as("nb"), first(col("tb")).as("tb"))
      .collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getLong(1) === 1L), "a bucket file must hold one bucket")
    assert(files.map(_.getLong(2)).distinct.length === files.length,
      "one file per bucket (the clustered demux)")
  }

  test("serve opens ONLY the probed buckets' files (partition-pruned postings scan)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = TextIndex.serve(spark, path, Seq("dup", "spark", "window"))
      assert(served.collect().nonEmpty)
      val scans = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
        .filter(_.scan.description.contains("In(tb"))
      assert(scans.nonEmpty, "expected the probed-bucket IN filter pushed to the postings scan")
      val nBuckets = spark.read.format(classOf[ManifestFileSink].getName)
        .option("path", s"$path/postings").load()
        .select(col("tb")).distinct().count()
      val fetch = scans.head
      val read = fetch.metrics("filesRead").value
      val pruned = fetch.metrics("filesPruned").value
      assert(read + pruned === nBuckets,
        s"read($read) + pruned($pruned) must cover all $nBuckets bucket files")
      assert(read <= 3, s"three terms probe at most three buckets (read=$read)")
      assert(read < nBuckets, s"the fetch must not open every bucket")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("served ranking is bit-identical to the in-query BM25 entry") {
    val got = TextIndex.serve(spark, path, Seq("dup", "spark", "window"))
      .collect().toSeq
    val want = TextAnalysis.bm25(spark, sf).collect().toSeq
    assert(got === want)
  }

  test("hybrid serve equals the in-query RRF fusion bit-for-bit") {
    val got = TextIndex.serveHybrid(spark, path, Seq("dup", "spark", "window"))
      .collect().toSeq
    val want = TextAnalysis.rrfFusion(spark, sf).collect().toSeq
    assert(got === want)
  }

  test("a pre-norms index layout rebuilds on build() instead of crashing hybrid serve") {
    val p = Files.createTempDirectory("graft-textindex-prenorms").toString
    TextIndex.build(spark, sf, p)
    // Simulate an index built before hybrid serving existed: norms gone,
    // fence still fresh.
    val norms = java.nio.file.Paths.get(s"$p/norms")
    val st = Files.walk(norms)
    try st.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => Files.delete(q))
    finally st.close()
    assert(!Files.isDirectory(norms))
    TextIndex.build(spark, sf, p)
    assert(Files.isDirectory(norms), "build must detect the missing table and rebuild")
    assert(TextIndex.serveHybrid(spark, p, Seq("dup", "spark", "window"))
      .collect().nonEmpty)
  }

  test("LEGACY layout (stored df, no version tag) migrates: build rebuilds, serve answers") {
    // Reconstruct the exact round-14 on-disk state that broke round 15
    // (verdict-r15 #1): postings still carry a STORED `df` column, the
    // fence is fresh, norms exist, and no layout tag was ever written —
    // a /tmp surviving across runs hands this to the new code. Serve
    // over it would join a SECOND df onto the postings
    // (AMBIGUOUS_REFERENCE); build() must detect the version mismatch
    // and rebuild cleanly instead.
    val fmt = classOf[ManifestFileSink].getName
    val p = Files.createTempDirectory("graft-textindex-legacy").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pr = TextIndex.postingRows(docs)
    val dfRel = pr.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumnRenamed("tok", "df_tok")
    val legacy = pr.join(dfRel, col("tok") === col("df_tok")).drop("df_tok")
      .select(col("tok"), col("tb"), col("doc_id"), col("dl"), col("tf"), col("df"))
    Files.createDirectories(java.nio.file.Paths.get(s"$p/postings"))
    ManifestFileSink.setPartitionColumn(s"$p/postings", "tb")
    legacy.write.format(fmt).option("path", s"$p/postings").mode("append").save()
    TextIndex.statsRow(pr).coalesce(1)
      .write.format(fmt).option("path", s"$p/stats").mode("append").save()
    // Legacy norms, written the round-14 way (df and n_docs re-counted
    // from the postings — the v3 writeNorms reads the dfparts table,
    // which this layout predates).
    Files.createDirectories(java.nio.file.Paths.get(s"$p/norms"))
    ManifestFileSink.setPartitionColumn(s"$p/norms", "db")
    val nLegacy = pr.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    pr.join(dfRel, col("tok") === col("df_tok"))
      .crossJoin(broadcast(nLegacy))
      .select(col("doc_id"),
        (col("tf").cast("double") * col("n_docs") / col("df")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nd"))
      .select(col("doc_id"), pmod(col("doc_id"), lit(64L)).as("db"), col("nd"))
      .write.format(fmt).option("path", s"$p/norms").mode("append").save()
    IndexFence.write(p, s"$sf/documents.parquet",
      IndexFence.fingerprint(s"$sf/documents.parquet"))
    // The legacy index reads as fresh by fence alone — the failure mode.
    assert(TextIndex.staleness(p).contains(false))
    assert(IndexFence.readLayout(p) === 0, "pre-versioning index carries no tag")
    // build() must see the layout mismatch and rebuild in place.
    TextIndex.build(spark, sf, p)
    assert(IndexFence.readLayout(p) === TextIndex.LayoutVersion)
    val schema = spark.read.format(fmt).option("path", s"$p/postings").load()
      .schema.fieldNames.filterNot(_.startsWith("_"))
    assert(!schema.contains("df"),
      s"rebuilt postings must use the segment-append layout, got ${schema.toSeq}")
    assert(TextIndex.serve(spark, p, Seq("dup", "spark", "window"))
      .collect().toSeq ===
      TextIndex.serve(spark, path, Seq("dup", "spark", "window")).collect().toSeq)
    assert(TextIndex.serveHybrid(spark, p, Seq("dup", "spark", "window"))
      .collect().toSeq ===
      TextIndex.serveHybrid(spark, path, Seq("dup", "spark", "window")).collect().toSeq)
  }

  test("staleness fence: drifted corpus → serve refuses, build rebuilds") {
    val dir = Files.createTempDirectory("graft-textindex-corpus").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$dir/documents.parquet")
    val p = Files.createTempDirectory("graft-textindex-fence").toString
    TextIndex.build(spark, dir, p)
    assert(TextIndex.staleness(p).contains(false))
    // Drift the corpus (append one doc) — serve must refuse.
    import spark.implicits._
    Seq((999999L, "drift doc text here", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    assert(TextIndex.staleness(p).contains(true))
    val e = intercept[IllegalStateException](
      TextIndex.serve(spark, p, Seq("dup")))
    assert(e.getMessage.contains("STALE"))
    // build() detects the drift and reconstructs in place; serve works.
    TextIndex.build(spark, dir, p)
    assert(TextIndex.staleness(p).contains(false))
    assert(TextIndex.serve(spark, p, Seq("drift")).collect().nonEmpty)
  }
}
