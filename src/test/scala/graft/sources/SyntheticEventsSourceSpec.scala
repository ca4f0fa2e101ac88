package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSv2 connector contract: filter pushdown narrows the planned key
  * range, column pruning reaches the reader, split planning parallelizes,
  * and reads are deterministic. */
class SyntheticEventsSourceSpec extends SparkTestBase {

  import spark.implicits._

  private def read(rows: Long = 1000, splits: Int = 4): DataFrame =
    spark.read.format("graft.sources.SyntheticEventsSource")
      .option("rows", rows.toString).option("splits", splits.toString).load()

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("full scan returns rows deterministic in id") {
    val df = read(1000)
    assert(df.count() === 1000)
    val a = df.orderBy($"id").collect()
    val b = read(1000).orderBy($"id").collect()
    assert(a.sameElements(b))
    // content is the advertised pure function of id
    val r42 = df.filter($"id" === 42).head()
    assert(r42.getLong(1) === SyntheticEventsSource.userOf(42))
    assert(r42.getString(2) === SyntheticEventsSource.kindOf(42))
    assert(r42.getDouble(3) === SyntheticEventsSource.valueOf(42))
  }

  test("id range predicates push down and narrow the planned range") {
    val df = read(100000, splits = 8).filter($"id" >= 90000 && $"id" < 90010)
    val p = scanDesc(df)
    assert(p.contains("range=[90000,90010)"),
      s"pushdown did not narrow the generator range:\n$p")
    assert(df.count() === 10)
  }

  test("equality predicate narrows to a single-key range") {
    val df = read(100000).filter($"id" === 12345)
    assert(scanDesc(df).contains("range=[12345,12346)"), scanDesc(df))
    assert(df.count() === 1)
  }

  test("non-id predicates stay residual (correct results, range unnarrowed)") {
    val df = read(1000).filter($"kind" === "click" && $"id" < 100)
    val p = scanDesc(df)
    assert(p.contains("range=[0,100)"), s"id filter should still push:\n$p")
    val expected = (0L until 100L).count(SyntheticEventsSource.kindOf(_) == "click")
    assert(df.count() === expected)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = read(1000).select($"user_id")
    val p = scanDesc(df)
    assert(p.contains("ReadSchema: struct<user_id:bigint>"),
      s"expected pruned single-column ReadSchema in:\n$p")
    assert(df.distinct().count() <= 97)
  }

  test("split planning: contradictory range plans the empty scan, not a failure") {
    val df = read(1000).filter($"id" > 5000L)
    assert(df.count() === 0)
  }

  test("splits partition the range") {
    val df = read(1000, splits = 7)
    assert(df.rdd.getNumPartitions === 7)
  }

  test("count/min/max push down completely — no generator runs") {
    val df = read(100000).filter($"id" >= 100 && $"id" < 50000)
      .agg(count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"))
    val p = scanDesc(df)
    assert(p.contains("AGG-PUSHDOWN"), s"aggregation did not push into the scan:\n$p")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((49900L, 100L, 49999L)))
  }

  test("aggregate pushdown declines grouping and non-id aggregates (results still right)") {
    val grouped = read(1000).groupBy($"kind").agg(count(lit(1)).as("n"))
    assert(!scanDesc(grouped).contains("AGG-PUSHDOWN"))
    assert(grouped.agg(sum($"n")).head().getLong(0) === 1000L)
    val other = read(1000).agg(min($"value"))
    assert(!scanDesc(other).contains("AGG-PUSHDOWN"))
    val expected = (0L until 1000L).map(SyntheticEventsSource.valueOf).min
    assert(other.head().getDouble(0) === expected)
  }

  test("pushed count over a contradictory range is zero, min/max null") {
    val df = read(1000).filter($"id" > 5000L)
      .agg(count(lit(1)).as("n"), min($"id").as("lo"))
    assert(scanDesc(df).contains("AGG-PUSHDOWN"), scanDesc(df))
    val r = df.head()
    assert(r.getLong(0) === 0L && r.isNullAt(1))
  }

  private def readStreamRows(rows: Long, ckpt: String,
      captured: scala.collection.mutable.ArrayBuffer[(Long, Long)]) =
    spark.readStream.format("graft.sources.SyntheticEventsSource")
      .option("rows", rows.toString).option("splits", "3")
      .option("ratePerBatch", "100")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.select($"id").collect().foreach { r =>
          captured.synchronized { captured += ((batchId, r.getLong(0))) }
        }
      }
      .start()

  test("micro-batch stream: rate-limited admission, exactly-once ids, restart continuity") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dsv2-stream").toString
    val captured = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // Phase 1: 250 ids at ≤100/trigger → ≥3 micro-batches, each id once.
    val q1 = readStreamRows(250, ckpt, captured)
    q1.processAllAvailable()
    q1.stop()
    val phase1 = captured.synchronized(captured.toList)
    assert(phase1.map(_._2).sorted == (0L until 250L).toList,
      s"phase 1 ids wrong: ${phase1.size} rows")
    assert(phase1.map(_._1).distinct.size >= 3,
      s"rate limit ignored: ${phase1.map(_._1).distinct}")
    assert(phase1.groupBy(_._1).values.forall(_.size <= 100),
      "a trigger admitted more than ratePerBatch ids")
    // Phase 2: the source has grown to 400 ids; a NEW query on the same
    // checkpoint must resume at id 250 — no replay, no gap.
    captured.synchronized(captured.clear())
    val q2 = readStreamRows(400, ckpt, captured)
    q2.processAllAvailable()
    q2.stop()
    val phase2 = captured.synchronized(captured.toList).map(_._2).sorted
    assert(phase2 == (250L until 400L).toList,
      s"restart did not resume at the checkpointed offset: ${phase2.take(5)}... (${phase2.size} rows)")
  }

  test("Trigger.AvailableNow drains everything despite the rate limit, then stops") {
    // ReadAllAvailable must admit all remaining ids — mapping it to the
    // rate default would stop after one 100-row batch and lose the rest.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dsv2-avnow").toString
    val captured = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.SyntheticEventsSource")
      .option("rows", "350").option("splits", "3")
      .option("ratePerBatch", "100")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select($"id").collect().foreach { r =>
          captured.synchronized { captured += r.getLong(0) }
        }
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
    val got = captured.synchronized(captured.toList).sorted
    assert(got == (0L until 350L).toList,
      s"AvailableNow drained ${got.size}/350 ids")
  }
}
