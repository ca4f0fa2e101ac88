package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.sources.EqualTo
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.sinks.{H2Config, RecordingDb, RecordingDriver}
import graft.sources.ManifestFileSink

/** E2E: the weighted change feed → maintained rollup → CONTINUOUS KEYED
  * UPSERT into H2 through the recording JDBC driver — the loop that gives
  * the reference's destination the incremental sink it never had (its one
  * sink is full-overwrite CSVREAD CTAS). Asserts the statement stream a
  * real H2 would receive: first contact creates the target + meta tables;
  * inserts arrive as `MERGE INTO … KEY`; a retraction that nets a group
  * to zero arrives as a keyed DELETE (and the group's other rows as an
  * updated MERGE image); and a REPLAYED batch (fresh checkpoint, same
  * feed) emits no DML at all — the in-database `__merge_meta` watermark
  * recognizes it. */
class H2UpsertSinkSpec extends SparkTestBase {

  private def fmt = classOf[ManifestFileSink].getName
  private val config = H2Config("h2:mem:upsert",
    driverClass = classOf[RecordingDriver].getName)

  private def append(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "name", "score").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
  }

  private def drain(base: String, root: String, table: String, ck: String): Unit = {
    val stream = spark.readStream.format(fmt).option("path", base)
      .option("changeFeedWeights", "true").load()
    val q = RollupMaintenance.weightedSinkToH2(
        stream, Seq("name"), Seq("score"), root, table, config)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("feed retraction → keyed DELETE; inserts → MERGE; replayed batch → no DML") {
    RecordingDb.reset()
    val base = Files.createTempDirectory("graft-h2up-base").toString
    val root = Files.createTempDirectory("graft-h2up-root").toString
    val ck1 = Files.createTempDirectory("graft-h2up-ck1").toString

    // Cycle 1: inserts across two groups.
    append(base, Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0)))
    drain(base, root, "rollup", ck1)
    val s1 = RecordingDb.statements
    assert(s1.exists(_.startsWith("CREATE TABLE \"rollup\" ")), "first contact creates the target")
    assert(s1.exists(_.startsWith("CREATE TABLE \"rollup__merge_meta\"")), "and the meta table")
    // The upserts arrive as ONE prepared, parameterized MERGE executed as
    // a batch of 2 — never spliced literals, never one statement per group.
    val mergeBatches1 = s1.filter(s =>
      s.startsWith("BATCH[") && s.contains("MERGE INTO \"rollup\""))
    assert(mergeBatches1.size === 1 && mergeBatches1.head.startsWith("BATCH[2]: ") &&
        mergeBatches1.head.contains("KEY (\"name\")") &&
        mergeBatches1.head.contains("VALUES (?") && !mergeBatches1.head.contains("'"),
      s"expected one prepared MERGE batched over 2 groups, got:\n${s1.mkString("\n")}")
    val rows1 = s1.filter(_.startsWith("ROW: "))
    assert(rows1.exists(r => r.contains("'x'") && r.contains("30.0") && r.contains(", 2")),
      s"group x carries its maintained image (sum=30.0, cnt=2): $rows1")
    assert(!s1.exists(s => s.contains("DELETE FROM \"rollup\" ")), "no retraction yet")
    assert(s1.contains("COMMIT"), "the batch commits as one transaction")

    // Cycle 2: retract y entirely (group → zero ⇒ DELETE) and grow x.
    ManifestFileSink.deleteWhere(base, EqualTo("id", 3L))
    append(base, Seq((4L, "x", 5.0)))
    drain(base, root, "rollup", ck1)
    val s2 = RecordingDb.statements.drop(s1.size)
    // The retraction is a prepared keyed DELETE (null-safe predicate),
    // batched — and its ROW carries the retracted key.
    val delBatches = s2.filter(s =>
      s.startsWith("BATCH[") && s.contains("DELETE FROM \"rollup\""))
    assert(delBatches === List(
        "BATCH[1]: DELETE FROM \"rollup\" WHERE " +
          "(\"name\" = ? OR (\"name\" IS NULL AND ? IS NULL))"),
      s"fully-retracted group must batch a prepared DELETE, got:\n${s2.mkString("\n")}")
    val delRowIdx = s2.indexOf(delBatches.head) + 1
    assert(s2(delRowIdx) === "ROW: ('y', 'y')",
      s"the DELETE batch must carry group y's key: ${s2(delRowIdx)}")
    val mergeRows2 = s2.zipWithIndex.collect {
      case (s, i) if s.startsWith("BATCH[") && s.contains("MERGE INTO \"rollup\"") =>
        s2(i + 1)
    }
    assert(mergeRows2.size === 1 && mergeRows2.head.contains("'x'") &&
        mergeRows2.head.contains("35.0"),
      s"surviving group re-merges its updated image: $mergeRows2")
    assert(!s2.exists(_.startsWith("CREATE TABLE")), "tables exist; no re-create")

    // Replay: a FRESH checkpoint re-delivers the whole feed as batchId 0 —
    // the at-least-once redelivery case. The H2-side watermark (batch 0
    // already applied) must swallow it: zero DML, zero COMMIT.
    val before = RecordingDb.statements.size
    val ck2 = Files.createTempDirectory("graft-h2up-ck2").toString
    drain(base, root, "rollup", ck2)
    val s3 = RecordingDb.statements.drop(before)
    assert(!s3.exists(s => s.contains("MERGE INTO") || s.contains("DELETE FROM \"rollup\"") ||
        s.startsWith("BATCH") || s.startsWith("ROW:")),
      s"replayed batch must emit no DML, got:\n${s3.mkString("\n")}")
    assert(!s3.contains("COMMIT"), "a recognized replay never commits")
  }
}
