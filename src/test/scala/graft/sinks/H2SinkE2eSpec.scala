package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** End-to-end sink verification through Spark's REAL JDBC write path
  * (DriverRegistry → ConnectionProvider → per-partition batched inserts),
  * using the [[RecordingDriver]] stub in place of the unavailable H2 jar.
  * Asserts the reference's load semantics: exact H2 DDL from [[ColType]],
  * hygienic identifier quoting, drop-then-create on overwrite
  * (H2CsvCreateSink.scala:54–58, 125–126), and batched inserts.
  */
class H2SinkE2eSpec extends SparkTestBase {

  private val config = H2Config("h2:mem:recording",
    driverClass = classOf[RecordingDriver].getName)

  private def sampleDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("ok", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "alpha", true), Row(2L, "beta", false), Row(3L, "", true),
        Row(4L, "delta", true), Row(5L, "epsilon", false)),
      schema)
  }

  test("first write emits ColType DDL with quoted idents, then batched inserts") {
    RecordingDb.reset()
    H2Sink.write(sampleDf, "t1", config)
    val st = RecordingDb.statements
    assert(st.head == "DROP TABLE IF EXISTS \"t1\"")
    assert(st(1) == "CREATE TABLE \"t1\" (\"id\" NUMERIC, \"name\" VARCHAR, \"ok\" BOOLEAN)")
    val batches = st.filter(_.startsWith("BATCH["))
    assert(batches.nonEmpty)
    // every batch is the same dialect-quoted parameterized insert
    batches.foreach { b =>
      assert(b.contains("INSERT INTO \"t1\" (\"id\",\"name\",\"ok\") VALUES (?,?,?)"))
    }
    // batching carried all 5 rows, in ≤ numPartitions batches (not row-at-a-time)
    val total = batches.map(_.substring("BATCH[".length).takeWhile(_ != ']').toInt).sum
    assert(total == 5)
    assert(batches.size <= config.numPartitions)
    assert(RecordingDb.tableNames == Set("t1"))
  }

  test("overwrite of an existing table issues drop-then-create before new inserts") {
    RecordingDb.reset()
    H2Sink.write(sampleDf, "t2", config)
    val afterFirst = RecordingDb.statements.size
    H2Sink.write(sampleDf, "t2", config)   // t2 exists now — overwrite
    val st = RecordingDb.statements
    val second = st.drop(afterFirst)
    val dropIdx = second.indexWhere(_ == "DROP TABLE IF EXISTS \"t2\"")
    val createIdx = second.indexWhere(_.startsWith("CREATE TABLE \"t2\""))
    val firstBatch = second.indexWhere(_.startsWith("BATCH["))
    assert(dropIdx == 0)
    assert(createIdx == 1)
    assert(firstBatch > createIdx)
    assert(RecordingDb.tableNames == Set("t2"))
  }

  test("declared column types reach the DDL verbatim (incl. H2-only TIME(9))") {
    RecordingDb.reset()
    val schema = StructType(Seq(
      StructField("at", StringType), StructField("label", StringType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("12:34:56.123456789", "x")), schema)
    H2Sink.write(df, "t3", config,
      declared = Some(Seq("at" -> ColType.CLocalTime, "label" -> ColType.CString)))
    val create = RecordingDb.statements.find(_.startsWith("CREATE TABLE")).get
    // TIME(9) is not expressible as a Spark SQL type — this is exactly why
    // DDL goes over the admin connection, not createTableColumnTypes.
    assert(create == "CREATE TABLE \"t3\" (\"at\" TIME(9), \"label\" VARCHAR)")
  }

  test("adversarial identifiers stay inert quoted idents end-to-end") {
    RecordingDb.reset()
    val evilCol = "from nowhere; drop table super_mission_critical; select *"
    val schema = StructType(Seq(StructField(evilCol, StringType)))
    val df = spark.createDataFrame(java.util.Arrays.asList(Row("v")), schema)
    H2Sink.write(df, "t4", config)
    val create = RecordingDb.statements.find(_.startsWith("CREATE TABLE")).get
    assert(create == s"""CREATE TABLE "t4" ("$evilCol" VARCHAR)""")
    // the recording db parsed it back as ONE column — nothing escaped
    assert(RecordingDb.executeQuery("SELECT * FROM \"t4\" WHERE 1=0")._1 == Seq(evilCol))
  }

  test("write → read round-trip through Spark's JDBC scan") {
    RecordingDb.reset()
    H2Sink.write(sampleDf, "t6", config)
    val back = H2Sink.read(spark, "t6", config)
    // schema resolved through the JDBC metadata path (stub serves VARCHAR)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "ok"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // empty string loaded as SQL NULL (reference CSVREAD semantics,
    // H2DestinationSpec.scala:253–263) and surfaced as NULL on read-back
    assert(rows == Set(
      ("1", "alpha", "true"), ("2", "beta", "false"), ("3", null, "true"),
      ("4", "delta", "true"), ("5", "epsilon", "false")))
  }

  test("writeBatch: staging + rename swap; re-run of the same batchId is idempotent") {
    RecordingDb.reset()
    H2Sink.writeBatch(sampleDf, "tb", batchId = 7L, config)
    val st = RecordingDb.statements
    // load goes to the batchId-tagged staging table, never the target
    assert(st.exists(_.startsWith("CREATE TABLE \"tb__stage_b7\"")))
    assert(st.filter(_.startsWith("BATCH[")).forall(_.contains("INSERT INTO \"tb__stage_b7\"")))
    // swap: drop old target, rename staging in — the only target mutation
    assert(st.containsSlice(Seq(
      "DROP TABLE IF EXISTS \"tb\"",
      "ALTER TABLE \"tb__stage_b7\" RENAME TO \"tb\"")))
    assert(RecordingDb.tableNames == Set("tb"))
    val rows = RecordingDb.rowsOf("tb").map(_.toSeq)
    assert(rows.size == 5)
    // re-delivery of the SAME batchId (failure replay) → identical target,
    // no leftover staging table
    H2Sink.writeBatch(sampleDf, "tb", batchId = 7L, config)
    assert(RecordingDb.tableNames == Set("tb"))
    assert(RecordingDb.rowsOf("tb").map(_.toSeq).sortBy(_.head.toString) ==
      rows.sortBy(_.head.toString))
  }

  test("writeBatch: successive batchIds GC abandoned staging siblings") {
    RecordingDb.reset()
    // Simulate a batch that crashed mid-load and was never retried: its
    // staging table exists, no swap ever ran.
    RecordingDb.executeUpdate("CREATE TABLE \"tg__stage_b3\" (\"id\" NUMERIC)")
    // Unrelated tables that merely SHARE the prefix text must survive GC:
    // a user table with a non-digit suffix, and another stream's target
    // whose name happens to extend the prefix.
    RecordingDb.executeUpdate("CREATE TABLE \"tg__stage_backup\" (\"id\" NUMERIC)")
    RecordingDb.executeUpdate("CREATE TABLE \"tg__stage_b2_copy\" (\"id\" NUMERIC)")
    H2Sink.writeBatch(sampleDf, "tg", batchId = 4L, config)
    // The abandoned b3 staging table is gone along with b4's own (renamed);
    // the prefix-sharing bystanders are untouched.
    assert(RecordingDb.tableNames == Set("tg", "tg__stage_backup", "tg__stage_b2_copy"),
      s"GC blast radius wrong: ${RecordingDb.tableNames}")
    assert(RecordingDb.statements.contains("DROP TABLE IF EXISTS \"tg__stage_b3\""))
    RecordingDb.executeUpdate("DROP TABLE \"tg__stage_backup\"")
    RecordingDb.executeUpdate("DROP TABLE \"tg__stage_b2_copy\"")
    // Two successive healthy batches: exactly one target, zero stage tables,
    // and the GC probe never touches tables outside the <name>__stage_b*
    // namespace (the target itself is only dropped by the swap, once per
    // batch).
    H2Sink.writeBatch(sampleDf, "tg", batchId = 5L, config)
    assert(RecordingDb.tableNames == Set("tg"))
    val targetDrops = RecordingDb.statements.count(_ == "DROP TABLE IF EXISTS \"tg\"")
    assert(targetDrops == 2)   // one per swap — GC never targets "tg"
  }

  test("unsupported declared types accumulate before any statement runs") {
    RecordingDb.reset()
    val schema = StructType(Seq(StructField("a", StringType)))
    val df = spark.createDataFrame(java.util.Arrays.asList(Row("v")), schema)
    val err = intercept[ColumnTypesNotSupported] {
      H2Sink.write(df, "t5", config, declared = Some(Seq(
        "a" -> ColType.CString,
        "b" -> ColType.COffsetDate,
        "c" -> ColType.CInterval)))
    }
    assert(err.types == List(ColType.COffsetDate, ColType.CInterval))
    assert(RecordingDb.statements.isEmpty)   // validation precedes DDL
  }

  test("validate probes the connection (reference validateConnection)") {
    assert(H2Sink.validate(config) == Right(()))
    // default driverClass org.h2.Driver is absent from this classpath
    val noDriver = H2Sink.validate(H2Config("h2:mem:x"))
    assert(noDriver.isLeft)
    assert(noDriver.swap.exists(_.contains("classpath")))
    // A loadable class that is not a java.sql.Driver must come back as a
    // Left too (Either contract), not a thrown ClassCastException.
    val notADriver = H2Sink.validate(H2Config("h2:mem:x", driverClass = "java.lang.String"))
    assert(notADriver.isLeft)
  }

  test("write-timing listener fires per write action (logHandler analog)") {
    val listener = WriteTimingListener.install(spark)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-timing").toString
      sampleDf.write.mode("overwrite").parquet(s"$dir/out")
      // listener dispatch is async on the listener bus
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var ok = false
      while (!ok && System.nanoTime() < deadline) {
        ok = listener.events.exists(e => e.error.isEmpty && e.millis >= 0)
        if (!ok) Thread.sleep(50)
      }
      assert(ok, s"no successful write event observed: ${listener.events}")
    } finally spark.listenerManager.unregister(listener)
  }
}
