package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestBase
import graft.sinks.H2Sink

/** Port of the reference's roundtrip fixtures (FIXTURES.md §A,
  * H2DestinationSpec.scala) at the CSV wire-format level: rows rendered in
  * Quasar's exact dialect (comma, `"` quote, `"` escape by doubling,
  * `\r\n` terminator, QUOTE_MINIMAL, no header — CsvSupport.scala:43–51)
  * must load back through [[Readers.csv]] with declared schema and
  * reference NULL semantics. The H2 leg itself is exercised only as DDL
  * generation ([[graft.sinks.SinkLayerSpec]]) since the H2 driver jar is
  * not available in this environment.
  */
class CsvRoundtripSpec extends SparkTestBase {

  /** Render rows in the Quasar CSV dialect (QUOTE_MINIMAL). */
  private def renderCsv(rows: Seq[Seq[String]]): String =
    rows.map(_.map { f =>
      if (f == null) ""
      else if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + f.replace("\"", "\"\"") + "\""
      else f
    }.mkString(",")).mkString("", "\r\n", "\r\n")

  private def writeTemp(content: String): Path = {
    val p = Files.createTempFile("graft-csv", ".csv")
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p
  }

  private def roundtrip(schema: StructType, rows: Seq[Seq[String]]): Seq[Row] = {
    val p = writeTemp(renderCsv(rows))
    try Readers.csv(spark, schema, p.toString).collect().toSeq
    finally Files.deleteIfExists(p)
  }

  test("simple two-column roundtrip (spec :110–121)") {
    val schema = StructType(Seq(
      StructField("x", StringType), StructField("y", DoubleType)))
    val out = roundtrip(schema, Seq(Seq("s", "8.0")))
    assert(out == Seq(Row("s", 8.0)))
  }

  test("multirow (spec :221–224)") {
    val schema = StructType(Seq(
      StructField("foo", DoubleType), StructField("bar", StringType),
      StructField("quux", DoubleType)))
    val out = roundtrip(schema,
      Seq(Seq("1.0", "a", "2.0"), Seq("3.0", "b", "4.0"), Seq("5.0", "c", "6.0")))
    assert(out.map(_.getString(1)) == Seq("a", "b", "c"))
  }

  test("unicode text survives (spec :161–174)") {
    val schema = StructType(Seq(StructField("string", StringType)))
    val s = "На берегу пустынных волн"
    assert(roundtrip(schema, Seq(Seq(s))) == Seq(Row(s)))
  }

  test("1,000,000-char string survives (spec :146–159)") {
    val schema = StructType(Seq(StructField("string", StringType)))
    val s = "q" * 1000000
    assert(roundtrip(schema, Seq(Seq(s))).head.getString(0) == s)
  }

  test("fields containing the dialect's special chars roundtrip via quoting") {
    val schema = StructType(Seq(StructField("s", StringType)))
    for (v <- Seq("a,b", "he said \"hi\"", "semi;colon", "tab\there"))
      assert(roundtrip(schema, Seq(Seq(v))) == Seq(Row(v)), v)
  }

  test("empty string loads as NULL (spec :253–263)") {
    val schema = StructType(Seq(StructField("x", StringType), StructField("y", StringType)))
    assert(roundtrip(schema, Seq(Seq("", ""))) == Seq(Row(null, null)))
  }

  test("empty input produces empty table with declared schema (spec :210–219)") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", DoubleType),
      StructField("c", DateType)))
    val p = writeTemp("")
    try {
      val df = Readers.csv(spark, schema, p.toString)
      assert(df.collect().isEmpty && df.schema == schema)
    } finally Files.deleteIfExists(p)
  }

  test("numeric bounds roundtrip (spec :239–251)") {
    val schema = StructType(Seq(StructField("d", DoubleType), StructField("n", DecimalType(38, 0))))
    val big = BigDecimal("99999999999999999999999999999999999999") // 38 digits
    val out = roundtrip(schema,
      Seq(Seq(Double.MaxValue.toString, big.toString()),
          Seq(Double.MinPositiveValue.toString, "0")))
    assert(out.head.getDouble(0) == Double.MaxValue)
    assert(out.head.getDecimal(1) == big.bigDecimal)
  }

  test("beyond-Decimal(38) numeric carries as string losslessly (spec :245, SURVEY §7.4.3)") {
    // The reference pushes BigDecimal(Long.MaxValue).pow(5) (~95 digits)
    // into H2's unbounded NUMERIC. Past Spark's Decimal(38) ceiling the
    // value is carried as a string column; the sink DDL still declares
    // NUMERIC (H2Sink.ddl keys off the declared ColType, not the Spark
    // type), so H2 coerces the string back to its unbounded NUMERIC on
    // insert. Here: string carriage is bit-perfect through the CSV
    // dialect, and the DDL half is pinned in SinkLayerSpec.
    // (BigInt, not Scala BigDecimal — the latter's pow rounds to the
    // DECIMAL128 MathContext and would silently truncate to 34 digits.)
    val big = BigInt(Long.MaxValue).pow(5).toString
    assert(big.length > 90)
    val schema = StructType(Seq(StructField("n", StringType)))
    val out = roundtrip(schema, Seq(Seq(big)))
    assert(out.head.getString(0) == big)
    import graft.sinks.{ColType, H2Sink}
    assert(H2Sink.ddl(Seq("n" -> ColType.CNumber)) == "\"n\" NUMERIC")
  }

  test("temporal bounds as carried types (spec :265–288, TemporalBounds.scala)") {
    // LocalTime/OffsetTime carry as strings (no Spark TIME type) — any
    // value including MIN/MAX roundtrips untouched. Dates/timestamps carry
    // natively within Spark's supported range.
    val schema = StructType(Seq(
      StructField("lt", StringType), StructField("ot", StringType),
      StructField("ld", DateType), StructField("ldt", TimestampNTZType)))
    val out = roundtrip(schema, Seq(Seq(
      "23:59:59.999999999", "23:59:59.999999999-18:00",
      "9999-12-31", "9999-12-31T23:59:59.999")))
    val r = out.head
    assert(r.getString(0) == "23:59:59.999999999")
    assert(r.getString(1) == "23:59:59.999999999-18:00")
    assert(r.getDate(2).toString == "9999-12-31")
    assert(r.getAs[java.time.LocalDateTime](3) ==
      java.time.LocalDateTime.parse("9999-12-31T23:59:59.999"))
  }

  test("reference extreme values end-to-end: string carriage + declared ColType DDL " +
       "(TemporalBounds.scala:21–36, spec :245)") {
    import java.time.{LocalDate, LocalDateTime}
    import graft.sinks.{ColType, H2Config, RecordingDb, RecordingDriver}
    // The reference's exact boundary constants: ±999999999-year dates and
    // datetimes (far outside Spark's Date/Timestamp range) and the
    // ~95-digit BigDecimal(Long.MaxValue).pow(5) (past Decimal(38)).
    val minD  = LocalDate.MIN.toString        // -999999999-01-01
    val maxD  = LocalDate.MAX.toString        // +999999999-12-31
    val minDt = LocalDateTime.MIN.toString    // -999999999-01-01T00:00
    val maxDt = LocalDateTime.MAX.toString    // +999999999-12-31T23:59:59.999999999
    val bigN  = BigInt(Long.MaxValue).pow(5).toString
    assert(minD.startsWith("-999999999") && maxDt.startsWith("+999999999")
      && bigN.length > 90)
    // 1. The declared-ColType carriage path is strings: all five survive
    //    the CSV wire format bit-exactly.
    val schema = StructType(Seq(
      StructField("ld", StringType), StructField("ldt", StringType),
      StructField("n", StringType)))
    val rows = Seq(Seq(minD, minDt, bigN), Seq(maxD, maxDt, "0"))
    assert(roundtrip(schema, rows).map(r => Seq(r.getString(0), r.getString(1), r.getString(2)))
      == rows)
    // 2. Through the sink with declared ColTypes: DDL keeps the exact H2
    //    types (DATE / TIMESTAMP(3) / unbounded NUMERIC — H2 coerces the
    //    strings on insert), and the recording driver sees the boundary
    //    values verbatim in the batched inserts.
    RecordingDb.reset()
    val config = H2Config("h2:mem:extremes", driverClass = classOf[RecordingDriver].getName)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*), schema)
    H2Sink.write(df, "extremes", config, declared = Some(Seq(
      "ld" -> ColType.CLocalDate, "ldt" -> ColType.CLocalDateTime,
      "n" -> ColType.CNumber)))
    val create = RecordingDb.statements.find(_.startsWith("CREATE TABLE")).get
    assert(create ==
      "CREATE TABLE \"extremes\" (\"ld\" DATE, \"ldt\" TIMESTAMP(3), \"n\" NUMERIC)")
    val got = RecordingDb.rowsOf("extremes").map(_.toSeq.map(String.valueOf)).toSet
    assert(got == rows.map(_.toSeq).toSet)
  }

  test("offset-type bounds end-to-end: string carriage + WITH TIME ZONE DDL " +
       "(TemporalBounds.scala:31–36, spec :265–273)") {
    import java.time.{OffsetDateTime, OffsetTime}
    import graft.sinks.{ColType, H2Config, RecordingDb, RecordingDriver}
    // The reference's offset-type boundary constants: extreme local parts
    // AND extreme ±18:00 offsets. OffsetTime has no Spark type at all;
    // the OffsetDateTime extremes (±999999999 years) are far outside
    // Spark's TimestampType range — both carry as ISO-8601 strings with
    // the declared ColType driving H2 DDL, exactly like the
    // LocalDate/LocalDateTime/NUMERIC extremes test above.
    val minOt  = OffsetTime.MIN.toString       // 00:00+18:00
    val maxOt  = OffsetTime.MAX.toString       // 23:59:59.999999999-18:00
    val minOdt = OffsetDateTime.MIN.toString   // -999999999-01-01T00:00+18:00
    val maxOdt = OffsetDateTime.MAX.toString   // +999999999-12-31T23:59:59.999999999-18:00
    assert(minOt == "00:00+18:00" && maxOt == "23:59:59.999999999-18:00")
    assert(minOdt.startsWith("-999999999") && minOdt.endsWith("+18:00"))
    assert(maxOdt.startsWith("+999999999") && maxOdt.endsWith("-18:00"))
    // 1. Bit-exact through the CSV wire format.
    val schema = StructType(Seq(
      StructField("ot", StringType), StructField("odt", StringType)))
    val rows = Seq(Seq(minOt, minOdt), Seq(maxOt, maxOdt))
    assert(roundtrip(schema, rows).map(r => Seq(r.getString(0), r.getString(1))) == rows)
    // 2. Through the sink with declared ColTypes: DDL keeps the exact
    //    H2-only WITH TIME ZONE types (ColType.scala:46,50 — never
    //    expressible via Spark's createTableColumnTypes), and the
    //    recording driver sees the boundary values verbatim.
    RecordingDb.reset()
    val config = H2Config("h2:mem:offsets", driverClass = classOf[RecordingDriver].getName)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*), schema)
    H2Sink.write(df, "offsets", config, declared = Some(Seq(
      "ot" -> ColType.COffsetTime, "odt" -> ColType.COffsetDateTime)))
    val create = RecordingDb.statements.find(_.startsWith("CREATE TABLE")).get
    assert(create == "CREATE TABLE \"offsets\" " +
      "(\"ot\" TIME(9) WITH TIME ZONE, \"odt\" TIMESTAMP(3) WITH TIME ZONE)")
    val got = RecordingDb.rowsOf("offsets").map(_.toSeq.map(String.valueOf)).toSet
    assert(got == rows.map(_.toSeq).toSet)
  }

  test("emptyStringsAsNull blanks only string columns (sink prep)") {
    import org.apache.spark.sql.functions.lit
    val df = spark.range(1).select(
      lit("").as("s"), lit("x").as("t"), lit(0.0).as("d"))
    val out = H2Sink.emptyStringsAsNull(df).collect().head
    assert(out.isNullAt(0) && out.getString(1) == "x" && out.getDouble(2) == 0.0)
  }

  test("overwrite semantics: second declared schema wins (spec :226–237)") {
    // Without live H2 the observable contract is: writing the same target
    // twice with different schemas yields the second schema (SaveMode
    // .Overwrite drops + recreates). Exercised against parquet here.
    val dir = Files.createTempDirectory("graft-ow").toString + "/t"
    import org.apache.spark.sql.functions.lit
    spark.range(2).select(lit(1.0).as("x"), lit("a").as("y"), lit(2.0).as("z"))
      .write.mode("overwrite").parquet(dir)
    spark.range(3).select(lit("b").as("a"), lit(9.0).as("c"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == Seq("a", "c") && back.count() == 3)
  }
}
