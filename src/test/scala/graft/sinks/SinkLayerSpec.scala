package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function coverage of the sink layer: type mapping totality, DDL,
  * identifier hygiene (the reference's adversarial strings), path
  * validation, error accumulation, and config redaction — ports of the
  * reference's H2DestinationSpec/H2DestinationModuleSpec cases that don't
  * need a live H2. */
class SinkLayerSpec extends AnyFunSuite {

  // ------------------------------------------------------------- ColType

  test("toH2Ddl is total over the 11 variants and rejects exactly OffsetDate and Interval") {
    val results = ColType.all.map(t => t -> ColType.toH2Ddl(t))
    val rejected = results.collect { case (t, Left(_)) => t }
    assert(rejected == List(ColType.COffsetDate, ColType.CInterval))
    assert(results.collect { case (_, Right(d)) => d } ==
      List("TINYINT", "BOOLEAN", "TIME(9)", "TIME(9) WITH TIME ZONE", "DATE",
        "TIMESTAMP(3)", "TIMESTAMP(3) WITH TIME ZONE", "NUMERIC", "VARCHAR"))
  }

  test("toSpark is total and agrees with toH2Ddl on supported set") {
    ColType.all.foreach { t =>
      assert(ColType.toSpark(t).isRight == ColType.toH2Ddl(t).isRight)
    }
  }

  // ----------------------------------------------------------- H2Dialect

  test("quoteIdentifier wraps and doubles embedded quotes (hygienicIdent)") {
    assert(H2Dialect.quoteIdentifier("foo") == "\"foo\"")
    assert(H2Dialect.quoteIdentifier("the \"table\" name") == "\"the \"\"table\"\" name\"")
  }

  test("injection attempts stay inert quoted identifiers (reference adversarial cases)") {
    val table = "foobar; drop table really_important; create table haha"
    assert(H2Dialect.quoteIdentifier(table) == "\"" + table + "\"")
    val column = "from nowhere; drop table super_mission_critical; select *"
    assert(H2Dialect.quoteIdentifier(column) == "\"" + column + "\"")
    // embedded quotes can't escape the quoted region
    val sneaky = "x\"; drop table y; --"
    assert(H2Dialect.quoteIdentifier(sneaky) == "\"x\"\"; drop table y; --\"")
  }

  test("canHandle matches h2 JDBC URLs only") {
    assert(H2Dialect.canHandle("jdbc:h2:mem:db1"))
    assert(H2Dialect.canHandle("JDBC:H2:tcp://host/db"))
    assert(!H2Dialect.canHandle("jdbc:postgresql://host/db"))
  }

  // -------------------------------------------------------------- H2Sink

  test("validateTableName accepts exactly one segment") {
    assert(H2Sink.validateTableName(Seq("t1")) == "t1")
    intercept[NotAResource](H2Sink.validateTableName(Seq.empty))
    intercept[NotAResource](H2Sink.validateTableName(Seq("a", "b")))
  }

  test("validateColumns accumulates all unsupported types before failing") {
    val err = intercept[ColumnTypesNotSupported] {
      H2Sink.validateColumns(Seq(
        "a" -> ColType.CString,
        "b" -> ColType.COffsetDate,
        "c" -> ColType.CInterval,
        "d" -> ColType.CNumber))
    }
    assert(err.types == List(ColType.COffsetDate, ColType.CInterval))
  }

  test("ddl renders hygienic idents with H2 types") {
    val d = H2Sink.ddl(Seq("x" -> ColType.CNumber, "the \"col\"" -> ColType.CString))
    assert(d == "\"x\" NUMERIC, \"the \"\"col\"\"\" VARCHAR")
  }

  // ------------------------------------------------------------ H2Config

  test("sanitizeUri redacts everything after the first semicolon") {
    assert(H2Config.sanitizeUri("h2:file:/db;USER=sa;PASSWORD=hunter2") ==
      "h2:file:/db;<REDACTED>")
    assert(H2Config.sanitizeUri("h2:mem:plain") == "h2:mem:plain")
  }

  test("sanitized config redacts server init password and script") {
    val c = H2Config("h2:file:/db;PASSWORD=s3cret",
      Some(ServerConfig(
        init = Some(InitConfig("CREATE USER admin PASSWORD 'x'", Some("pw"))),
        tcp = Some(TcpConfig(Some(9092))), pg = None)))
    val s = c.sanitized
    assert(s.connectionUri == "h2:file:/db;<REDACTED>")
    assert(s.server.get.init.get == InitConfig("<REDACTED>", Some("<REDACTED>")))
    assert(s.server.get.tcp.get == TcpConfig(Some(9092)))  // ports survive
  }

  test("jdbcUrl prefixes jdbc:") {
    assert(H2Config("h2:mem:t").jdbcUrl == "jdbc:h2:mem:t")
  }

  // ------------------------------------------------------------ H2Server

  test("server start without H2 on the classpath fails with a clear message") {
    val err = intercept[IllegalStateException] {
      H2Server.start(ServerConfig(None, Some(TcpConfig(None)), None), "jdbc:h2:mem:x")
    }
    assert(err.getMessage.contains("classpath"))
  }
}
