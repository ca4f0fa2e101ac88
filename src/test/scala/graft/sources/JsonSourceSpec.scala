package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** JSON source: declared-schema and schema-inferred reads, including
  * missing-field ⇒ NULL and nested extraction. */
class JsonSourceSpec extends SparkTestBase {

  private def writeLines(lines: Seq[String]): String = {
    val p = java.nio.file.Files.createTempFile("graft-json", ".json")
    java.nio.file.Files.writeString(p,
      lines.mkString("\n"))
    p.toString
  }

  test("declared-schema read maps fields and nulls missing ones") {
    val path = writeLines(Seq(
      """{"id": 1, "name": "a", "score": 1.5}""",
      """{"id": 2, "score": 2.5}""",
      """{"id": 3, "name": "c"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val rows = Readers.json(spark, schema, path)
      .orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(1), "missing name must be NULL")
    assert(rows(2).isNullAt(2), "missing score must be NULL")
    assert(rows(0).getString(1) == "a" && rows(1).getDouble(2) == 2.5)
  }

  test("inferred read discovers fields including nested structs") {
    val path = writeLines(Seq(
      """{"id": 1, "meta": {"k": 10, "tag": "x"}}""",
      """{"id": 2, "meta": {"k": 20, "tag": "y"}}"""))
    val df = Readers.jsonInfer(spark, path)
    val ks = df.selectExpr("meta.k").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ks == Seq(10L, 20L))
  }
}
