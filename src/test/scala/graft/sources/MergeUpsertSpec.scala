package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Atomic MERGE (upsert) on the manifest table: matched keys replaced and
  * new keys inserted in ONE commit — deletion vectors and new data files
  * in the same manifest, snapshot-atomic, time-travelable, and visible to
  * the weighted change feed as one z-set window. */
class MergeUpsertSpec extends SparkTestBase {

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String =
    Files.createTempDirectory("graft-merge").toString

  private def append(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
  }

  private def state(dir: String): Seq[(Long, String, Double)] =
    spark.read.format(fmt).option("path", dir).load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)

  test("merge replaces matched keys and inserts new ones in one commit") {
    import spark.implicits._
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val preMerge = ManifestFileSink.latestManifest(dir).get

    val batch = Seq((2L, "b2", 22.0), (4L, "d", 4.0)).toDF("id", "name", "score")
    val (retracted, inserted) = ManifestFileSink.mergeUpsert(dir, batch, "id")
    assert((retracted, inserted) === (1L, 2L))
    assert(state(dir) === Seq((1L, "a", 1.0), (2L, "b2", 22.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    assert(ManifestFileSink.manifests(dir).size === 2, "the merge is ONE commit")
    // Time travel: the pre-merge snapshot still has the old image.
    assert(spark.read.format(fmt).option("path", dir)
      .option("asOfManifest", preMerge).load()
      .where("id = 2").collect().map(_.getString(1)).toSeq === Seq("b"))
  }

  test("merge into an empty table is a plain atomic insert") {
    import spark.implicits._
    val dir = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val (retracted, inserted) = ManifestFileSink.mergeUpsert(
      dir, Seq((1L, "a", 1.0)).toDF("id", "name", "score"), "id")
    assert((retracted, inserted) === (0L, 1L))
    assert(state(dir) === Seq((1L, "a", 1.0)))
  }

  test("repeated merge of the same batch converges (replace, not accumulate)") {
    import spark.implicits._
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0)))
    val batch = Seq((1L, "a9", 9.0)).toDF("id", "name", "score")
    assert(ManifestFileSink.mergeUpsert(dir, batch, "id") === ((1L, 1L)))
    assert(ManifestFileSink.mergeUpsert(dir, batch, "id") === ((1L, 1L)))
    assert(state(dir) === Seq((1L, "a9", 9.0)), "second merge re-replaced, state stable")
  }

  test("the weighted change feed sees a merge as one z-set window") {
    import spark.implicits._
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val resume = ManifestFileSink.latestManifest(dir).get
    ManifestFileSink.mergeUpsert(
      dir, Seq((2L, "b2", 22.0), (3L, "c", 3.0)).toDF("id", "name", "score"), "id")
    val feed = spark.read.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").option("sinceManifest", resume).load()
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
      .sortBy(r => (r._1, r._3))
    assert(feed.toSeq === Seq((2L, 2.0, -1), (2L, 22.0, 1), (3L, 3.0, 1)),
      "old image retracted, new image + insert at +1")
  }

  test("merge after purge and over evolved files still matches by key") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((2L, "b", 2.0)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val (retracted, inserted) = ManifestFileSink.mergeUpsert(
      dir, Seq((1L, "a2", 11.0)).toDF("id", "name", "score"), "id")
    assert((retracted, inserted) === (1L, 1L))
    assert(state(dir) === Seq((1L, "a2", 11.0), (2L, "b", 2.0)))
    // Maintenance pipeline over the merge: migrate old-schema files, then
    // purge — the migrated file's single row was retracted, so it drops.
    assert(ManifestFileSink.migrateSchema(dir) === 1)
    assert(ManifestFileSink.applyDeletes(dir) === 1)
    assert(state(dir) === Seq((1L, "a2", 11.0), (2L, "b", 2.0)))
  }
}
