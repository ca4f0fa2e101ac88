package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The trigram text index: per-file 3-byte-window Blooms on designated
  * string columns prune pushed substring probes — sound (a match implies
  * every needle trigram present), useful exactly for RARE needles (a
  * saturated-common-text bloom simply stops pruning, never lies). */
class TrigramIndexSpec extends SparkTestBase {

  import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

  private def fmt = classOf[ManifestFileSink].getName

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-trgm").toString
    ManifestFileSink.setTrigramIndex(p, Seq("text"))
    import spark.implicits._
    // Two files with disjoint vocabularies — one per write.
    Seq((1L, "alpha bravo charlie delta echo"),
        (2L, "alpha bravo foxtrot golf hotel"))
      .toDF("doc_id", "text").coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    Seq((3L, "zebra yankee xylophone whiskey"),
        (4L, "zebra victor uniform tango alpha"))
      .toDF("doc_id", "text").coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    p
  }

  private def probe(cond: org.apache.spark.sql.Column): (Seq[Long], Long, Long) = {
    val q = spark.read.format(fmt).option("path", path).load().filter(cond)
    val ids = q.collect().map(_.getLong(0)).sorted.toSeq
    val scan = q.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    (ids, scan.metrics("filesRead").value, scan.metrics("filesPruned").value)
  }

  test("contains() on a rare needle opens only the file that can hold it") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (ids, read, pruned) = probe(col("text").contains("xylophone"))
      assert(ids === Seq(3L))
      assert(read === 1 && pruned === 1,
        s"the foxtrot file's bloom must refute 'xylophone' (read=$read pruned=$pruned)")
      // startsWith/endsWith route through the same index.
      val (ids2, _, pruned2) = probe(col("text").startsWith("zebra"))
      assert(ids2 === Seq(3L, 4L) && pruned2 === 1)
      val (ids3, _, pruned3) = probe(col("text").endsWith("hotel"))
      assert(ids3 === Seq(2L) && pruned3 === 1)
      // A needle in both vocabularies prunes nothing and misses nothing.
      val (ids4, read4, _) = probe(col("text").contains("alpha"))
      assert(ids4 === Seq(1L, 2L, 4L) && read4 === 2)
      // Sub-trigram needles make no claim (sound default).
      val (ids5, read5, pruned5) = probe(col("text").contains("ta"))
      assert(read5 === 2 && pruned5 === 0)
      assert(ids5 === Seq(1L, 4L)) // delta, tango
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("needle spanning a token boundary is still sound (byte windows, not tokens)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // "bravo charlie" crosses the space — present only in file 1.
      val (ids, read, pruned) = probe(col("text").contains("bravo charlie"))
      assert(ids === Seq(1L))
      assert(read === 1 && pruned === 1)
      // A needle whose trigrams ALL exist but never contiguously: bloom
      // may admit (false positive is allowed), results stay exact.
      val (ids2, _, _) = probe(col("text").contains("echo alpha"))
      assert(ids2 === Seq.empty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("TBLPROPERTIES ('trgm.columns', 'bloom.columns') declare the indexes via SQL") {
    val root = Files.createTempDirectory("graft-trgmsql").toString
    spark.conf.set("spark.sql.catalog.gtg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtg.root", root)
    spark.sql(
      """CREATE TABLE gtg.db.docs (doc_id BIGINT, text STRING)
        |TBLPROPERTIES ('trgm.columns' = 'text', 'bloom.columns' = 'doc_id')""".stripMargin)
    assert(ManifestFileSink.trigramColumns(s"$root/db/docs") === Set("text"))
    assert(ManifestFileSink.bloomColumns(s"$root/db/docs") === Set("doc_id"))
    spark.sql("INSERT INTO gtg.db.docs VALUES (1, 'quetzal ostrich')")
    spark.sql("INSERT INTO gtg.db.docs VALUES (2, 'walrus pangolin')")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.table("gtg.db.docs").filter(col("text").contains("pangolin"))
      assert(q.collect().map(_.getLong(0)).toSeq === Seq(2L))
      val scan = q.queryExecution.executedPlan
        .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }.head
      assert(scan.metrics("filesPruned").value === 1,
        "the SQL-declared trigram index must prune the other file")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // Unknown column / wrong type refuse at CREATE.
    intercept[Exception](spark.sql(
      "CREATE TABLE gtg.db.bad (id BIGINT) TBLPROPERTIES ('trgm.columns' = 'nope')"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gtg.db.bad2 (id BIGINT) TBLPROPERTIES ('trgm.columns' = 'id')"))
  }
}
