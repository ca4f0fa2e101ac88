package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

/** Drives the streaming transforms end-to-end through MemoryStream →
  * transform → memory sink, including watermark-driven late-data drop,
  * session windows, watermarked dedup, and custom state. */
class StreamsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def runComplete(name: String)(build: => org.apache.spark.sql.DataFrame,
                                        mode: OutputMode = OutputMode.Complete()) = {
    val q = build.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("hourly tumbling window counts aggregate by window and type") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(5), 100, "click", 1.0),
      Event(2, ts(20), 100, "click", 2.0),
      Event(3, ts(40), 101, "view", 3.0))
    val out = runComplete("hourly")(Streams.hourlyTypeCounts(in.toDF()))
    val rows = out.collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("session windows split on gap") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    // user 100: events at 10:00 and 10:10 (one session, gap 30m), then 11:30 (new session)
    in.addData(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(10), 100, "click", 1.0),
      Event(3, Timestamp.valueOf("2024-01-01 11:30:00"), 100, "click", 1.0))
    val out = runComplete("sessions")(Streams.sessionCounts(in.toDF()))
    val counts = out.collect().map(_.getLong(3)).sorted.toSeq
    assert(counts == Seq(1L, 2L))
  }

  test("stream-static enrichment join broadcasts the dimension, keeps dimension-less events") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(1), 101, "view", 2.0),
      Event(3, ts(2), 999, "click", 3.0)) // no dimension row
    val dim = Seq((100L, "alice"), (101L, "bob")).toDF("user_id", "dim_name")
    val q = Streams.enrichWithDim(in.toDF(), dim).writeStream
      .format("memory").queryName("enrich").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich")
      .select($"event_id", $"dim_name").as[(Long, Option[String])].collect().toSet
    assert(rows === Set((1L, Some("alice")), (2L, Some("bob")), (3L, None)))
    // plan: the static side must broadcast — no shuffle of the stream
    val p = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dim join in:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the unbounded side must not shuffle:\n$p")
  }

  test("dropDuplicatesWithinWatermark removes in-watermark repeats") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 100, "click", 1.0),
      Event(1, ts(1), 100, "click", 1.0),  // duplicate id
      Event(2, ts(2), 100, "view", 2.0))
    val q = Streams.dedupByEventId(in.toDF()).writeStream
      .format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState accumulates per-user running totals") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.runningUserTotals(in.toDS()).writeStream
      .format("memory").queryName("totals").outputMode(OutputMode.Update()).start()
    in.addData(Event(1, ts(0), 100, "click", 1.5), Event(2, ts(1), 100, "view", 2.5))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 100, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    // Update mode emits one row per batch; the last row carries final state.
    val last = spark.table("totals").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1)
    assert(last == (3L, 5.0))
  }

  test("transformWithState accumulates per-user totals via ValueState (RocksDB store)") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = Streams.runningUserTotalsTws(in.toDS()).writeStream
        .format("memory").queryName("tws").outputMode(OutputMode.Update()).start()
      in.addData(Event(1, ts(0), 100, "click", 1.5), Event(2, ts(1), 100, "view", 2.5))
      q.processAllAvailable()
      in.addData(Event(3, ts(2), 100, "click", 1.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1)
      assert(last == (3L, 5.0))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("native graft_topk aggregate merges bounded state across microbatches") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.topEventsPerUser(in.toDF(), 2).writeStream
      .format("memory").queryName("topk_stream")
      .outputMode(OutputMode.Complete()).start()
    in.addData(Event(1, ts(0), 100, "click", 5.0), Event(2, ts(1), 100, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 100, "click", 9.0), Event(4, ts(3), 101, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("topk_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // k=2 bound held across triggers: batch-2's 9.0 displaced batch-1's 1.0.
    assert(rows == Set((100L, 1L, 3L, 9.0), (100L, 2L, 1L, 5.0), (101L, 1L, 4L, 2.0)))
  }

  test("native graft_freq_items sketch merges bounded state across microbatches") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.frequentUsersPerKind(in.toDF(), cap = 2).writeStream
      .format("memory").queryName("freq_stream")
      .outputMode(OutputMode.Complete()).start()
    // batch 1: user 100 dominates 'click'
    in.addData(Event(1, ts(0), 100, "click", 1.0), Event(2, ts(1), 100, "click", 1.0),
      Event(3, ts(2), 101, "click", 1.0))
    q.processAllAvailable()
    // batch 2: three more distinct users hit 'click' — with cap=2 the
    // sketch must evict, but the dominant user 100 (5 of 8 clicks) is
    // guaranteed to survive: count 5 > n/(cap+1) = 8/3.
    in.addData(Event(4, ts(3), 100, "click", 1.0), Event(5, ts(4), 100, "click", 1.0),
      Event(6, ts(5), 100, "click", 1.0), Event(7, ts(6), 102, "click", 1.0),
      Event(8, ts(7), 103, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("freq_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 2, s"cap bound violated: ${rows.mkString(",")}")
    val heavy = rows.filter(_._2 == 100L)
    assert(heavy.nonEmpty, s"dominant user evicted despite MG guarantee: ${rows.mkString(",")}")
    assert(heavy.head._3 >= 3, s"lower bound too weak: ${heavy.head}")
  }

  test("graft_image_meta decodes blob headers in a streaming pipeline") {
    // The scan-fused header decode must compose with Structured Streaming
    // (deterministic expression, no state): incoming blob micro-batches →
    // per-format dimension aggregates, e.g. a live ingest-quality monitor.
    import spark.implicits._
    import graft.functions.ImageFunctions.imageMeta
    import graft.llm.Multimodal
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Array[Byte])]
    val q = in.toDF().toDF("media_id", "bytes")
      .select(imageMeta(org.apache.spark.sql.functions.col("bytes")).as("m"))
      .groupBy($"m.format".as("format"))
      .agg(org.apache.spark.sql.functions.max($"m.width").as("max_w"),
           org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.format("memory").queryName("img_stream")
      .outputMode(OutputMode.Complete()).start()
    in.addData((1L, Multimodal.synthPng(640, 480)), (2L, Multimodal.synthJpeg(320, 200)))
    q.processAllAvailable()
    in.addData((3L, Multimodal.synthPng(1920, 1080)), (4L, "junk".getBytes))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("img_stream").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set(("png", 1920, 2L), ("jpeg", 320, 1L), ("unknown", -1, 1L)))
  }

  test("stream-stream interval join matches views within 15 minutes before the click") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = Streams.clickViewJoin(clicks.toDF(), views.toDF()).writeStream
      .format("memory").queryName("ssjoin").outputMode(OutputMode.Append()).start()
    views.addData(
      Event(10, ts(0), 100, "view", 1.0),   // 20 min before click: outside window
      Event(11, ts(10), 100, "view", 1.0),  // 10 min before: inside
      Event(12, ts(15), 101, "view", 1.0))  // other user: no match
    clicks.addData(Event(1, ts(20), 100, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 11L)))
  }

  test("stream-stream LEFT OUTER join null-completes a click once it can no longer match") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = Streams.clickViewJoinLeftOuter(clicks.toDF(), views.toDF()).writeStream
      .format("memory").queryName("ssjoin_outer").outputMode(OutputMode.Append()).start()
    views.addData(Event(11, ts(10), 100, "view", 1.0))
    clicks.addData(
      Event(1, ts(20), 100, "click", 1.0),  // matched by view 11
      Event(2, ts(20), 102, "click", 1.0))  // no view will ever qualify
    q.processAllAvailable()
    // The unmatched click must NOT appear yet — a late view could still
    // arrive. Advance both watermarks past its interval end, then one
    // more batch so the evicted state flushes as a null-completed row.
    views.addData(Event(13, ts(55), 101, "view", 1.0))
    clicks.addData(Event(3, ts(55), 101, "click", 1.0))
    q.processAllAvailable()
    clicks.addData(Event(4, ts(59), 103, "click", 1.0))
    views.addData(Event(14, ts(59), 104, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(rows.contains((1L, Some(11L))), s"inner match missing: $rows")
    assert(rows.contains((3L, Some(13L))), s"same-instant match missing: $rows")
    assert(rows.contains((2L, None)),
      s"unmatched click was never null-completed after watermark passed: $rows")
  }

  test("stream-stream FULL OUTER join null-completes both unmatched sides") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = Streams.clickViewJoinOuter(clicks.toDF(), views.toDF(), "full_outer")
      .writeStream.format("memory").queryName("ssjoin_full")
      .outputMode(OutputMode.Append()).start()
    views.addData(
      Event(11, ts(10), 100, "view", 1.0),  // matched below
      Event(12, ts(10), 300, "view", 1.0))  // no click will ever qualify
    clicks.addData(
      Event(1, ts(20), 100, "click", 1.0),  // matched by view 11
      Event(2, ts(20), 102, "click", 1.0))  // no view will ever qualify
    q.processAllAvailable()
    // Advance both watermarks past every interval end, plus a flush batch.
    views.addData(Event(13, ts(55), 200, "view", 1.0))
    clicks.addData(Event(3, ts(55), 201, "click", 1.0))
    q.processAllAvailable()
    views.addData(Event(14, ts(59), 200, "view", 1.0))
    clicks.addData(Event(4, ts(59), 201, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin_full").collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
       if (r.isNullAt(1)) None else Some(r.getLong(1)))
    }.toSet
    assert(rows.contains((Some(1L), Some(11L))), s"inner match missing: $rows")
    assert(rows.contains((Some(2L), None)), s"unmatched click not completed: $rows")
    assert(rows.contains((None, Some(12L))), s"unmatched view not completed: $rows")
  }

  test("event-time timeout closes a session when the watermark passes last+gap") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.sessionsClosedByTimeout(in.toDS()).writeStream
      .format("memory").queryName("timeout_sessions")
      .outputMode(OutputMode.Append()).start()
    // Open a session for user 100 (2 events, 5 minutes apart). User 300's
    // two events in the SAME batch jump 45 min — more than the gap — so
    // the first must close in the data path, backfill-style, while the
    // second stays open.
    in.addData(Event(1, ts(0), 100, "click", 1.0), Event(2, ts(5), 100, "view", 1.0),
      Event(5, ts(0), 300, "click", 1.0), Event(6, ts(45), 300, "view", 1.0))
    q.processAllAvailable()
    val afterB1 = spark.table("timeout_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!afterB1.exists(_._1 == 100L),
      "session emitted while the watermark could still extend it")
    assert(afterB1.toSeq == Seq((300L, 1L)),
      s"in-batch gap did not split the backfilled session: ${afterB1.mkString(",")}")
    // Another user's much-later events push the watermark past
    // last(10:05) + gap(30m) + delay(10m); the next batch fires the timeout.
    in.addData(Event(3, ts(55), 200, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(4, ts(57), 200, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("timeout_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3) - r.getLong(2)))
    assert(closed.exists(_ == ((100L, 2L, 300000L))),
      s"user-100 session not closed by event-time timeout: ${closed.mkString(",")}")
    assert(!closed.exists(_._1 == 200L), "user-200 session closed while still open")
  }

  test("late data beyond the watermark is dropped from append-mode windows") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.hourlyTypeCounts(in.toDF()).writeStream
      .format("memory").queryName("late").outputMode(OutputMode.Append()).start()
    // Advance watermark far past the 10:00 window...
    in.addData(Event(1, ts(5), 100, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(2, Timestamp.valueOf("2024-01-01 13:00:00"), 100, "click", 1.0))
    q.processAllAvailable()
    // ...then a very late event for the closed 10:00 window: must be ignored.
    in.addData(Event(3, ts(6), 100, "click", 100.0))
    q.processAllAvailable()
    q.stop()
    val tenOclock = spark.table("late").collect()
      .filter(_.getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(tenOclock.map(_.getLong(2)).toSeq == Seq(1L))
  }

  test("foreachBatch H2 sink drives the real JDBC write path per microbatch") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.sinks.RecordingDb.reset()
    val config = graft.sinks.H2Config("h2:mem:stream",
      driverClass = classOf[graft.sinks.RecordingDriver].getName)
    val in = MemoryStream[Event]
    val q = Streams.writeToH2(in.toDS(), "stream_t", config).start()
    in.addData(Event(1, ts(0), 100, "click", 1.0), Event(2, ts(1), 101, "view", 2.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 102, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val st = graft.sinks.RecordingDb.statements
    // each microbatch loads a batchId-tagged staging table, then swaps it
    // in with DROP + RENAME (idempotent re-delivery, no partial target)
    assert(st.exists(_.startsWith("CREATE TABLE \"stream_t__stage_b0\"")))
    assert(st.exists(_.startsWith("CREATE TABLE \"stream_t__stage_b1\"")))
    assert(st.count(_ == "DROP TABLE IF EXISTS \"stream_t\"") == 2)
    assert(st.count(_.matches("ALTER TABLE \"stream_t__stage_b\\d+\" RENAME TO \"stream_t\"")) == 2)
    assert(st.exists(s => s.startsWith("BATCH[") && s.contains("INSERT INTO \"stream_t__stage_b")))
    // the second microbatch's swap replaced the first batch's rows
    assert(graft.sinks.RecordingDb.rowsOf("stream_t").size == 1)
    assert(graft.sinks.RecordingDb.tableNames == Set("stream_t"))
  }

  test("checkpoint recovery: a restarted query resumes state and offsets exactly") {
    // The restart contract a production stream lives on: kill the process,
    // start a NEW query object over the SAME checkpoint, and (a) aggregate
    // state continues from where it stopped, (b) already-committed input
    // files are not reprocessed. MemoryStream can't express this (its data
    // dies with the query), so this drives a real replayable file source.
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-recovery").toString
    val (srcDir, ckpt) = (s"$root/in", s"$root/ckpt")
    Files.createDirectories(Paths.get(srcDir))
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val captured = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    def startQuery() =
      Streams.userTotals(spark.readStream.schema(schema).json(srcDir))
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batch.collect().foreach { r =>
            captured.synchronized {
              captured += ((batchId, r.getLong(0), r.getLong(1), r.getDouble(2)))
            }
          }
        }
        .start()

    Files.writeString(Paths.get(s"$srcDir/f1.json"),
      """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","user_id":100,"event_type":"click","value":1.5}
        |{"event_id":2,"ts":"2024-01-01T10:01:00.000Z","user_id":100,"event_type":"view","value":2.5}
        |""".stripMargin)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(captured.synchronized(captured.toList).map(t => (t._2, t._3, t._4))
      .contains((100L, 2L, 4.0)), s"phase 1 missing user-100 total: $captured")

    // Process death simulated: q1 is gone; f2 arrives while nothing runs.
    Files.writeString(Paths.get(s"$srcDir/f2.json"),
      """{"event_id":3,"ts":"2024-01-01T10:02:00.000Z","user_id":100,"event_type":"click","value":1.0}
        |{"event_id":4,"ts":"2024-01-01T10:03:00.000Z","user_id":101,"event_type":"view","value":9.0}
        |""".stripMargin)
    captured.synchronized(captured.clear())
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val phase2 = captured.synchronized(captured.toList).map(t => (t._2, t._3, t._4)).toSet
    // 3 events / 5.0 proves BOTH halves: state recovered (not 1 / 1.0 from
    // a cold aggregate) AND f1 not replayed (not 5 events / 9.0 double-count).
    assert(phase2.contains((100L, 3L, 5.0)), s"state did not recover: $phase2")
    assert(phase2.contains((101L, 1L, 9.0)), s"new key missing post-restart: $phase2")
  }

  test("transformWithState recovers RocksDB ValueState across a restart") {
    // The checkpoint-recovery contract again, but for the Spark 4 typed
    // stateful API on its required RocksDB store: per-key ValueState must
    // come back from the checkpoint in a NEW query (new process, in
    // production) and continue, with committed input not replayed.
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-tws-recovery").toString
      val (srcDir, ckpt) = (s"$root/in", s"$root/ckpt")
      Files.createDirectories(Paths.get(srcDir))
      val schema = org.apache.spark.sql.Encoders.product[Event].schema
      // foreachBatch, not the memory sink: memory rejects recovery from
      // an existing checkpoint ("does not support recovering").
      val captured = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      def startQuery() =
        Streams.runningUserTotalsTws(
            spark.readStream.schema(schema).json(srcDir).as[Event])
          .toDF()
          .writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.collect().foreach { r =>
              captured.synchronized {
                captured += ((r.getLong(0), r.getLong(1), r.getDouble(2)))
              }
            }
          }
          .start()
      Files.writeString(Paths.get(s"$srcDir/f1.json"),
        """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","user_id":100,"event_type":"click","value":1.5}
          |{"event_id":2,"ts":"2024-01-01T10:01:00.000Z","user_id":100,"event_type":"view","value":2.5}
          |""".stripMargin)
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop()
      Files.writeString(Paths.get(s"$srcDir/f2.json"),
        """{"event_id":3,"ts":"2024-01-01T10:02:00.000Z","user_id":100,"event_type":"click","value":1.0}
          |""".stripMargin)
      captured.synchronized(captured.clear())
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
      val phase2 = captured.synchronized(captured.toList)
        .map(t => (t._2, t._3)).maxBy(_._1)
      // 3 events / 5.0 = ValueState recovered AND f1 not replayed.
      assert(phase2 == (3L, 5.0), s"RocksDB state did not recover: $phase2")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("graft_bloom_agg builds a membership sketch incrementally across microbatches") {
    // Streaming sketch build: the Bloom aggregate's binary buffer lives in
    // the state store and ORs together across triggers, so a pipeline can
    // maintain a continuously-updated membership filter (e.g. "grams seen
    // so far" for online decontamination) without reprocessing history.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().select(col("value").as("x"))
      .agg(call_function("graft_bloom_agg", xxhash64(col("x")), lit(10000L), lit(80000L)).as("bf"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode(OutputMode.Complete()).start()
    in.addData(1L, 2L, 3L)
    q.processAllAvailable()
    in.addData(1000L, 2000L)
    q.processAllAvailable()
    q.stop()
    val bf = spark.table("bloom_stream").collect().head.getAs[Array[Byte]]("bf")
    val hits = Seq(1L, 3L, 1000L, 2000L, 777L).toDF("x")
      .select(col("x"), call_function("graft_might_contain", lit(bf), xxhash64(col("x"))).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // Members from BOTH batches must probe true (no false negatives after
    // the cross-trigger merge); the sized filter makes a fp on 777 wildly
    // unlikely but it is not a hard guarantee, so only members are pinned.
    assert(Seq(1L, 3L, 1000L, 2000L).forall(hits(_)),
      s"cross-batch member missed: $hits")
  }

  test("Trigger.AvailableNow drains the backlog in rate-limited batches, then stops") {
    // Backfill mode: process everything that exists NOW with the
    // streaming engine (checkpoints, state, rate limits all apply), then
    // terminate — how a periodic batch job shares code and exactly-once
    // semantics with the continuous pipeline. maxFilesPerTrigger=1 forces
    // the backlog to drain as multiple bounded micro-batches rather than
    // one giant one (the OOM guard a real backfill needs).
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-availablenow").toString
    val (srcDir, ckpt) = (s"$root/in", s"$root/ckpt")
    Files.createDirectories(Paths.get(srcDir))
    for (i <- 1 to 3)
      Files.writeString(Paths.get(s"$srcDir/f$i.json"),
        s"""{"event_id":$i,"ts":"2024-01-01T10:0$i:00.000Z","user_id":100,"event_type":"click","value":$i.0}
           |""".stripMargin)
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val batchIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last: Option[(Long, Double)] = None
    val q = Streams.userTotals(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir))
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.collect().foreach { r =>
          batchIds.synchronized {
            batchIds += batchId
            last = Some((r.getLong(1), r.getDouble(2)))
          }
        }
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    // Drained as 3 rate-limited batches; final state saw all 6.0 = 1+2+3.
    val (ids, lastSeen) = batchIds.synchronized((batchIds.distinct.size, last))
    assert(ids == 3, s"expected 3 bounded micro-batches, got $batchIds")
    assert(lastSeen.contains((3L, 6.0)), s"backlog not fully drained: $lastSeen")
  }
}
