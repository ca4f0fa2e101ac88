package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: the write path must produce files whose footer
  * min/max stats are prunable on BOTH interleaved dimensions. */
class ZOrderLayoutSpec extends SparkTestBase {

  private def fileSpans(dir: String, colName: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f).agg(min(colName), max(colName)).head()
      (r.getLong(0), r.getLong(1))
    }
  }

  private def meanSpanRatio(spans: Seq[(Long, Long)]): Double = {
    val lo = spans.map(_._1).min; val hi = spans.map(_._2).max
    val global = (hi - lo).toDouble max 1.0
    spans.map { case (a, b) => (b - a).toDouble / global }.sum / spans.size
  }

  test("z-ordered files have compact min/max spans in both dimensions") {
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.01").lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", 16, 16, s"$base/z")
    // Control: the same data in arrival (orderkey) order — each file
    // spans essentially the whole partkey/suppkey range.
    li.repartitionByRange(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/naive")

    val zPk = meanSpanRatio(fileSpans(s"$base/z", "l_partkey"))
    val zSk = meanSpanRatio(fileSpans(s"$base/z", "l_suppkey"))
    val nPk = meanSpanRatio(fileSpans(s"$base/naive", "l_partkey"))
    val nSk = meanSpanRatio(fileSpans(s"$base/naive", "l_suppkey"))
    // Naive layout: every file covers ~the full range of both keys.
    assert(nPk > 0.9 && nSk > 0.9, s"control layout unexpectedly clustered: $nPk / $nSk")
    // Z-order: 16 files tile the plane ~4×4, so each file should span
    // roughly a quarter of each dimension; allow headroom for range
    // boundary sampling. This is the property that makes min/max footer
    // pruning work for predicates on EITHER key.
    assert(zPk < 0.45, s"z-order did not compact l_partkey spans: $zPk")
    assert(zSk < 0.45, s"z-order did not compact l_suppkey spans: $zSk")
    // Row count is preserved by the rewrite.
    assert(spark.read.parquet(s"$base/z").count() == li.count())
  }

  test("zvalue interleave is exact and order-embedding on tile corners") {
    val df = spark.range(0, 4).select(col("id").as("x"))
      .crossJoin(spark.range(0, 4).select(col("id").as("y")))
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y"), 2).as("z"))
    val got = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // Morton order for 2 bits: z = x0 + 2*y0 + 4*x1 + 8*y1
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
    assert(got((3L, 3L)) == 15L && got((2L, 1L)) == 6L && got((1L, 2L)) == 9L)
  }
}
