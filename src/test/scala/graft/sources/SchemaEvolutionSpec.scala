package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, IsNull}
import graft.SparkTestBase

/** Schema evolution on the manifest table: per-file schemas reconciled by
  * NAME at read time (added columns backfill NULL, dropped columns are
  * ignored, order is immaterial), loud plan-time refusal of type changes,
  * zone maps resolved against each file's own column positions, DELETE
  * semantics over backfilled columns, and the copy-on-write
  * `migrateSchema` rewrite that re-enables compaction. */
class SchemaEvolutionSpec extends SparkTestBase {

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String =
    Files.createTempDirectory("graft-evo").toString

  test("added column backfills NULL in files that predate it") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((3L, "c", 3.5)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()

    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.columns.toSeq === Seq("id", "name", "score"),
      "read schema is the latest snapshot's")
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .sortBy(_._1)
    assert(rows === Array((1L, "a", null), (2L, "b", null), (3L, "c", 3.5)))
    // Predicates over the backfilled column behave as SQL NULL.
    assert(back.where("score IS NULL").count() === 2)
    assert(back.where("score > 1.0").count() === 1)
  }

  test("dropped column is ignored; column order is reconciled by name") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a", 1.5)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    // Latest schema reorders and drops `name`.
    Seq((2.5, 2L)).toDF("score", "id").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()

    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.columns.toSeq === Seq("score", "id"))
    assert(back.collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
      === Array((1.5, 1L), (2.5, 2L)))
  }

  test("zone maps prune against each file's own column positions") {
    import spark.implicits._
    val dir = freshDir()
    // Same columns, different ORDER: id is position 0 in file 1, position 1
    // in file 2 — positional stats must not cross-talk.
    Seq((10L, 1.0)).toDF("id", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((2.0, 20L)).toDF("score", "id").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.where("id = 10").collect().map(_.getLong(1)).toSeq === Seq(10L))
    assert(back.where("id = 20").collect().map(_.getLong(1)).toSeq === Seq(20L))
    assert(back.where("id = 15").count() === 0)
  }

  test("type change refuses loudly at plan time") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq(("oops", "b")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val err = intercept[Exception] {
      spark.read.format(fmt).option("path", dir).load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("cannot change a column's type")),
      s"wanted the evolution refusal, got: $err")
  }

  test("DELETE over a backfilled column: IS NULL hits old rows, comparisons never do") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((2L, "b", 2.0)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    // score > 0 is NULL for the backfilled row — it survives.
    assert(ManifestFileSink.deleteWhere(dir,
      org.apache.spark.sql.sources.GreaterThan("score", 0.0)) === 1)
    assert(spark.read.format(fmt).option("path", dir).load()
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // IS NULL is definitively TRUE for it.
    assert(ManifestFileSink.deleteWhere(dir, IsNull("score")) === 1)
    assert(spark.read.format(fmt).option("path", dir).load().count() === 0)
  }

  test("migrateSchema rewrites old files to the latest DDL and re-enables compaction") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((3L, "c", 3.5)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    // Mixed schemas refuse to compact...
    val err = intercept[IllegalStateException] { ManifestFileSink.compact(dir) }
    assert(err.getMessage.contains("migrateSchema"))
    // ...until migrated.
    assert(ManifestFileSink.migrateSchema(dir) === 1, "one old file rewritten")
    assert(ManifestFileSink.manifests(dir).size === 1)
    assert(ManifestFileSink.migrateSchema(dir) === 0, "homogeneous: no-op")
    val back = spark.read.format(fmt).option("path", dir).load()
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .sortBy(_._1)
    assert(rows === Array((1L, "a", null), (2L, "b", null), (3L, "c", 3.5)))
    // The table keeps working after migration.
    Seq((4L, "d", 4.0)).toDF("id", "name", "score")
      .write.format(fmt).option("path", dir).mode("append").save()
    assert(ManifestFileSink.compact(dir) === 2)
    assert(spark.read.format(fmt).option("path", dir).load().count() === 4)
  }

  test("migrateSchema carries deletion vectors to the renamed file, positions intact") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    ManifestFileSink.deleteWhere(dir, EqualTo("id", 2L))
    Seq((4L, "d", 4.0)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    assert(ManifestFileSink.migrateSchema(dir) === 1)
    assert(spark.read.format(fmt).option("path", dir).load()
      .select("id").collect().map(_.getLong(0)).sorted === Array(1L, 3L, 4L))
    // The vector survived migration and still purges correctly.
    assert(ManifestFileSink.applyDeletes(dir) === 1)
    assert(spark.read.format(fmt).option("path", dir).load()
      .select("id").collect().map(_.getLong(0)).sorted === Array(1L, 3L, 4L))
  }

  test("streaming commit feed reconciles evolved commits to the stream schema") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((2L, "b", 2.0)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val out = Files.createTempDirectory("graft-evo-out").toString
    val ck = Files.createTempDirectory("graft-evo-ck").toString
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .select("id", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
      .sortBy(_._1)
    assert(got === Array((1L, null), (2L, 2.0)))
  }
}
