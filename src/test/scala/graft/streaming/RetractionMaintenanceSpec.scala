package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import graft.SparkTestBase
import graft.sources.ManifestFileSink

/** End-to-end continuous view maintenance UNDER RETRACTIONS: the weighted
  * change feed streams base-table commits as z-set deltas (+1 inserts, −1
  * deletion-vector images), foreachBatch folds them into per-key partials,
  * and mergeUpsert applies the maintained rows to a VIEW table atomically.
  * The maintained view must equal a from-scratch recompute after appends,
  * row-level deletes, an upsert, and a stream restart — the full loop the
  * round's mutation + CDC + merge primitives exist to close. */
class RetractionMaintenanceSpec extends SparkTestBase {

  private def fmt = classOf[ManifestFileSink].getName

  private def append(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
  }

  /** Drain the weighted feed and fold deltas into the view table. */
  private def maintain(base: String, view: String, ck: String): Unit = {
    val q = spark.readStream.format(fmt).option("path", base)
      .option("changeFeedWeights", "true").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val deltas = batch.groupBy("name").agg(
          sum(col("score") * col("_change_weight")).as("ds"),
          sum(col("_change_weight").cast("long")).as("dn"))
        val spark2 = batch.sparkSession
        val current =
          if (ManifestFileSink.latestManifest(view).isEmpty)
            spark2.createDataFrame(
              spark2.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType.fromDDL(
                "name STRING, s DOUBLE, n BIGINT"))
          else spark2.read.format(fmt).option("path", view).load()
        // O(delta) maintenance: only keys the window touched are read
        // from the view and written back — never a full-view rewrite.
        val next = deltas.join(current, Seq("name"), "left_outer")
          .select(col("name"),
            (coalesce(col("s"), lit(0.0)) + coalesce(col("ds"), lit(0.0))).as("s"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
        val live = next.filter(col("n") > 0)
        // A fully-retracted group must VANISH from the view: mergeUpsert
        // replaces keys it carries, the dead keys need an explicit delete.
        val dead = next.filter(col("n") <= 0).select("name")
          .collect().map(_.getString(0))
        ManifestFileSink.mergeUpsert(view, live, "name")
        if (dead.nonEmpty)
          ManifestFileSink.deleteWhere(view, In("name", dead.toArray[Any]))
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def snapshot(dir: String): Map[String, (Double, Long)] =
    spark.read.format(fmt).option("path", dir).load()
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def recompute(base: String): Map[String, (Double, Long)] =
    spark.read.format(fmt).option("path", base).load()
      .groupBy("name").agg(sum("score").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("maintained view tracks appends, deletes, and merges across restarts") {
    val base = Files.createTempDirectory("graft-rm-base").toString
    val view = Files.createTempDirectory("graft-rm-view").toString
    val ck = Files.createTempDirectory("graft-rm-ck").toString

    // Cycle 1: plain inserts.
    append(base, Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0)))
    maintain(base, view, ck)
    assert(snapshot(view) === recompute(base))

    // Cycle 2: a row-level delete (retraction) and more inserts.
    ManifestFileSink.deleteWhere(base, EqualTo("id", 2L))
    append(base, Seq((4L, "z", 40.0)))
    maintain(base, view, ck)
    assert(snapshot(view) === recompute(base))
    assert(snapshot(view)("x") === ((10.0, 1L)), "x lost its retracted row")

    // Cycle 3: an atomic merge on the BASE (old image out, new image in)
    // plus a delete that empties a whole group.
    import spark.implicits._
    ManifestFileSink.mergeUpsert(base,
      Seq((3L, "y", 300.0)).toDF("id", "name", "score"), "id")
    ManifestFileSink.deleteWhere(base, In("id", Array(4L)))
    maintain(base, view, ck)
    assert(snapshot(view) === recompute(base))
    assert(!snapshot(view).contains("z"), "fully-retracted group must vanish")
    assert(snapshot(view)("y") === ((300.0, 1L)), "merge = retract old + insert new")

    // Replay safety: re-running with the same checkpoint admits nothing new.
    maintain(base, view, ck)
    assert(snapshot(view) === recompute(base))
  }
}
