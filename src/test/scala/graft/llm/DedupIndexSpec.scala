package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.functions._

/** The persisted dedup-index contract: build once into band-bucketed +
  * doc-bucketed layouts, serve a small batch by opening ONLY the probed
  * buckets' files on BOTH tables, agree exactly with the in-query
  * cross-split Jaccard, refuse staleness. */
class DedupIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-dedupindex").toString
    DedupIndex.build(spark, sf, p)
    p
  }

  private def fmtTable(sub: String) =
    spark.read.format(classOf[ManifestFileSink].getName)
      .option("path", s"$path/$sub").load()

  test("build demuxes single-bucket data files on both tables") {
    for ((sub, key) <- Seq("bands" -> "bb", "shingles" -> "db")) {
      val files = fmtTable(sub)
        .groupBy(col("_file"))
        .agg(countDistinct(col(key)).as("nb"))
        .collect()
      assert(files.nonEmpty, s"$sub table must have data files")
      assert(files.forall(_.getLong(1) === 1L),
        s"every $sub file must hold exactly one $key bucket")
    }
  }

  test("a small batch probes few band buckets and few shingle buckets") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // Two near-dup batch docs (ids far outside the corpus id space):
      // one clones corpus text, one is novel.
      val corpus = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") % 13 =!= 5)
      val cloneText = corpus.orderBy(col("doc_id")).limit(1)
        .select(col("text")).collect()(0).getString(0)
      import spark.implicits._
      val batch = Seq(
        (1000001L, cloneText),
        (1000002L, "entirely novel text payload nothing shares these tokens"))
        .toDF("doc_id", "text")
      val served = DedupIndex.serve(spark, path, batch)
      val got = served.collect()
      assert(got.nonEmpty, "the cloned doc must match its corpus source")
      assert(got.forall(_.getLong(1) === 1000001L),
        "only the clone may match")
      val scans = served.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
      val bandScan = scans.filter(_.scan.description.contains("In(bb"))
      val shScan = scans.filter(_.scan.description.contains("In(db"))
      assert(bandScan.nonEmpty, "expected the probed-bucket IN filter on bands")
      assert(shScan.nonEmpty, "expected the probed-bucket IN filter on shingles")
      val nBandFiles = fmtTable("bands").select(col("bb")).distinct().count()
      val nShFiles = fmtTable("shingles").select(col("db")).distinct().count()
      val bRead = bandScan.head.metrics("filesRead").value
      val bPruned = bandScan.head.metrics("filesPruned").value
      assert(bRead + bPruned === nBandFiles,
        s"band read($bRead)+pruned($bPruned) must cover all $nBandFiles")
      assert(bRead < nBandFiles, "two docs must not probe every band bucket")
      val sRead = shScan.head.metrics("filesRead").value
      val sPruned = shScan.head.metrics("filesPruned").value
      assert(sRead + sPruned === nShFiles,
        s"shingle read($sRead)+pruned($sPruned) must cover all $nShFiles")
      assert(sRead < nShFiles,
        "a handful of candidates must not open every shingle bucket")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("served pairs equal the in-query cross-split exact Jaccard") {
    val got = DedupIndex.dedupIndexServe(spark, sf).collect().toSeq
    // In-query reference: same kernels, no index — all shingles from the
    // corpus scan, candidate restriction dropped (full verify).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = Dedup.shingleRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val want = Dedup.jaccardPairsFromShingles(sh, 0.8, None)
      .filter(col("d1") % 13 =!= 5 && col("d2") % 13 === 5
        || col("d2") % 13 =!= 5 && col("d1") % 13 === 5)
      .select(
        when(col("d1") % 13 =!= 5, col("d1")).otherwise(col("d2")).as("d1"),
        when(col("d1") % 13 === 5, col("d1")).otherwise(col("d2")).as("d2"),
        col("jaccard"))
      .orderBy(col("d1"), col("d2"))
      .collect().toSeq
    assert(got === want)
    sh.unpersist(blocking = true)
  }

  test("staleness fence: drifted corpus → serve refuses, build rebuilds") {
    val dir = Files.createTempDirectory("graft-dedupindex-corpus").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$dir/documents.parquet")
    val p = Files.createTempDirectory("graft-dedupindex-fence").toString
    DedupIndex.build(spark, dir, p)
    assert(DedupIndex.staleness(p).contains(false))
    import spark.implicits._
    Seq((999999L, "drift doc text here", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    assert(DedupIndex.staleness(p).contains(true))
    val e = intercept[IllegalStateException](
      DedupIndex.serve(spark, p,
        Seq((5L, "any text at all")).toDF("doc_id", "text")))
    assert(e.getMessage.contains("STALE"))
    DedupIndex.build(spark, dir, p)
    assert(DedupIndex.staleness(p).contains(false))
  }
}
