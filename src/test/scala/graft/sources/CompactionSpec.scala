package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Small-file compaction — the maintenance job every long-lived 100 TB
  * table needs: streaming/incremental writers leave thousands of KB-sized
  * files whose per-file open/footer cost dominates scans; compaction
  * rewrites them into few range-clustered files. Pinned properties: file
  * count drops to the target, content survives exactly, and the rewrite
  * leaves files with DISJOINT key ranges (so min/max footer stats prune
  * file-level, the same property the Z-order path exploits for 2D). */
class CompactionSpec extends SparkTestBase {

  private def partFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compaction rewrites 64 small files into 4 range-disjoint files, content-exact") {
    val root = Files.createTempDirectory("graft-compact").toString
    val (smallDir, bigDir) = (s"$root/small", s"$root/compacted")

    val src = spark.range(0, 100000).select(
      col("id").as("k"), md5(col("id").cast("string")).as("payload"))
    src.repartition(64).write.parquet(smallDir)
    assert(partFiles(smallDir).length == 64, "fixture should start fragmented")

    // The compaction job: one range shuffle on the cluster key.
    spark.read.parquet(smallDir)
      .repartitionByRange(4, col("k"))
      .write.parquet(bigDir)

    val files = partFiles(bigDir)
    assert(files.length == 4, s"expected 4 compacted files, got ${files.length}")

    // Content identical (row count + order-insensitive checksum).
    def fingerprint(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(k, payload))")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(fingerprint(bigDir) == fingerprint(smallDir))

    // Range clustering: per-file [min, max] key intervals must not
    // overlap — the property that lets footer stats skip whole files.
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"overlapping compacted ranges: ${ranges.mkString(",")}")
      case _ =>
    }
  }
}
