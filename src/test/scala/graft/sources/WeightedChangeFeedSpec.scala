package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import graft.SparkTestBase

/** The weighted change feed (`changeFeedWeights`): the table feed as a
  * Z-SET — inserts arrive as `_change_weight` +1 rows, row-level deletes
  * as −1 rows whose images are read back from the deletion vector's
  * positions. This is the uniform CDC input the engine's retraction IVM
  * (signed-delta join algebra) consumes: applying the weighted deltas to
  * a baseline aggregate must always equal recomputing from the current
  * snapshot. */
class WeightedChangeFeedSpec extends SparkTestBase {

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String =
    Files.createTempDirectory("graft-wcf").toString

  private def append(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
  }

  test("initial load: current snapshot at weight +1, vectors subtracted") {
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    ManifestFileSink.deleteWhere(dir, EqualTo("id", 2L))
    val feed = spark.read.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").load()
    assert(feed.columns.toSeq === Seq("id", "name", "score", "_change_weight"))
    val rows = feed.collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(rows.toSeq === Seq((1L, 1)))
  }

  test("since-diff: window inserts at +1, retracted row images at -1") {
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val resume = ManifestFileSink.latestManifest(dir).get
    ManifestFileSink.deleteWhere(dir, In("id", Array(1L, 3L)))
    append(dir, Seq((4L, "d", 4.0)))

    val feed = spark.read.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").option("sinceManifest", resume).load()
    val rows = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(r => (r._1, r._4))
    assert(rows.toSeq === Seq(
      (1L, "a", 1.0, -1), // full retracted image, not just the key
      (3L, "c", 3.0, -1),
      (4L, "d", 4.0, 1)))
  }

  test("z-set identity: baseline + weighted deltas == current snapshot aggregate") {
    val dir = freshDir()
    append(dir, Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0)))
    val resume = ManifestFileSink.latestManifest(dir).get
    // Baseline pinned to the resume snapshot (time travel) — the plan is
    // lazy, and an unpinned read would see files committed after resume.
    val baseline = spark.read.format(fmt).option("path", dir)
      .option("asOfManifest", resume).load()
      .groupBy("name").agg(sum("score").as("s"), count(lit(1)).as("n"))

    ManifestFileSink.deleteWhere(dir, EqualTo("id", 2L))
    append(dir, Seq((4L, "y", 40.0), (5L, "z", 50.0)))
    ManifestFileSink.deleteWhere(dir, EqualTo("id", 3L))

    val deltas = spark.read.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").option("sinceManifest", resume).load()
      .groupBy("name").agg(
        sum(col("score") * col("_change_weight")).as("ds"),
        sum(col("_change_weight").cast("long")).as("dn"))
    val maintained = baseline.join(deltas, Seq("name"), "full_outer")
      .select(col("name"),
        (coalesce(col("s"), lit(0.0)) + coalesce(col("ds"), lit(0.0))).as("s"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
      .filter(col("n") > 0)
    val recomputed = spark.read.format(fmt).option("path", dir).load()
      .groupBy("name").agg(sum("score").as("s"), count(lit(1)).as("n"))
    val m = maintained.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val rc = recomputed.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(m.toSeq === rc.toSeq, "incrementally maintained view drifted from recompute")
  }

  test("a row inserted AND deleted inside the window nets to weight 0") {
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0)))
    val resume = ManifestFileSink.latestManifest(dir).get
    append(dir, Seq((2L, "b", 2.0)))
    ManifestFileSink.deleteWhere(dir, EqualTo("id", 2L))
    val feed = spark.read.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").option("sinceManifest", resume).load()
    val net = feed.groupBy("id").agg(sum("_change_weight").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(net === Map(2L -> 0L), s"got $net")
  }

  test("streaming weighted feed: inserts and retractions in one z-set stream") {
    val dir = freshDir()
    append(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    ManifestFileSink.deleteWhere(dir, EqualTo("id", 1L))
    append(dir, Seq((3L, "c", 3.0)))

    val out = Files.createTempDirectory("graft-wcf-out").toString
    val ck = Files.createTempDirectory("graft-wcf-ck").toString
    val q = spark.readStream.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .groupBy("id").agg(sum("_change_weight").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L), s"got $got")
    // The net-weight view equals the table's current state.
    assert(spark.read.format(fmt).option("path", dir).load()
      .select("id").collect().map(_.getLong(0)).sorted === Array(2L, 3L))
  }

  test("weighted feed reconciles evolved files: retracted image backfills NULL") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val resume = ManifestFileSink.latestManifest(dir).get
    Seq((2L, "b", 2.0)).toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    ManifestFileSink.deleteWhere(dir, EqualTo("id", 1L))
    val feed = spark.read.format(fmt).option("path", dir)
      .option("changeFeedWeights", "true").option("sinceManifest", resume).load()
    val rows = feed.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(2)) null else r.getDouble(2), r.getInt(3)))
      .sortBy(r => (r._1, r._3))
    assert(rows.toSeq === Seq((1L, null, -1), (2L, 2.0, 1)))
  }
}
