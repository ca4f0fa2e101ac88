package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ORC source: type/null round-trip plus the scale contract — predicates
  * and column pruning must reach the ORC scan exactly as they do for
  * parquet (same V2 pushdown machinery). */
class OrcSourceSpec extends SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/t"
    Seq(
      (1L, Some("alpha"), Some(1.5), Some(java.sql.Date.valueOf("2024-01-01"))),
      (2L, None, Some(-2.25), None),
      (3L, Some(""), None, Some(java.sql.Date.valueOf("2024-06-30"))))
      .toDF("id", "s", "d", "dt")
      .repartition(2).write.mode("overwrite").orc(d)
    d
  }

  test("orc roundtrip preserves schema, nulls, and empty-vs-null strings") {
    val back = Readers.orc(spark, dir).orderBy(col("id")).collect()
    assert(back.length == 3)
    assert(back(1).isNullAt(1) && back(2).getString(1) == "")  // null != ""
    assert(back(1).getDouble(2) == -2.25 && back(2).isNullAt(2))
    assert(back(1).isNullAt(3))
  }

  test("filters and projection push down to the ORC scan") {
    val q = Readers.orc(spark, dir).filter(col("id") > 1).select(col("id"), col("d"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("id"),
      s"expected id filter pushed to ORC scan:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("dt"), s"scan reads unused column: $readSchema")
  }
}
