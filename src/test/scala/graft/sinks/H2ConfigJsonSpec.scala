package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** JSON-level config decode + sanitize, mirroring the reference's
  * H2DestinationModuleSpec.scala:66–131 shapes (adapted to this ADT's
  * field vocabulary) plus the malformed ⇒ `{}` rule of
  * `sanitizeDestinationConfig` (H2DestinationModule.scala:54–57). */
class H2ConfigJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def sameJson(a: String, b: String): Boolean =
    mapper.readTree(a) == mapper.readTree(b)

  test("does not redact connectionUri if there are no properties") {
    val js = """{"connectionUri":"h2:file:/data/sample","server":null}"""
    assert(sameJson(H2ConfigJson.sanitize(js), js))
  }

  test("redacts properties in connectionUri (server field is json null)") {
    val js = """{"connectionUri":"h2:file:~/sample;USER=sa;PASSWORD=123","server":null}"""
    assert(sameJson(H2ConfigJson.sanitize(js),
      """{"connectionUri":"h2:file:~/sample;<REDACTED>","server":null}"""))
  }

  test("redacts properties in connectionUri (without server field, null made explicit)") {
    val js = """{"connectionUri":"h2:file:~/sample;USER=sa;PASSWORD=123"}"""
    assert(sameJson(H2ConfigJson.sanitize(js),
      """{"connectionUri":"h2:file:~/sample;<REDACTED>","server":null}"""))
  }

  test("redacts config with server field (init script AND password; ports survive)") {
    val js =
      """{"connectionUri":"h2:file:~/sample;USER=sa;PASSWORD=123",
        | "server":{"init":{"script":"CREATE USER admin PASSWORD 'x'","password":"pw"},
        |           "tcp":{"port":9092,"allowOthers":true},
        |           "pg":{"port":5435}}}""".stripMargin
    assert(sameJson(H2ConfigJson.sanitize(js),
      """{"connectionUri":"h2:file:~/sample;<REDACTED>",
        | "server":{"init":{"script":"<REDACTED>","password":"<REDACTED>"},
        |           "tcp":{"port":9092,"allowOthers":true},
        |           "pg":{"port":5435,"allowOthers":false}}}""".stripMargin))
  }

  test("redacts config with server field having null tcp field") {
    val js =
      """{"connectionUri":"h2:file:~/sample;USER=sa;PASSWORD=123",
        | "server":{"init":{"script":"someScript","password":"somePassword"},
        |           "tcp":null,
        |           "pg":{"port":5435}}}""".stripMargin
    assert(sameJson(H2ConfigJson.sanitize(js),
      """{"connectionUri":"h2:file:~/sample;<REDACTED>",
        | "server":{"init":{"script":"<REDACTED>","password":"<REDACTED>"},
        |           "tcp":null,
        |           "pg":{"port":5435,"allowOthers":false}}}""".stripMargin))
  }

  test("redacts config with server field with missing tcp field") {
    val js =
      """{"connectionUri":"h2:file:~/sample;USER=sa;PASSWORD=123",
        | "server":{"init":{"script":"someScript","password":"somePassword"},
        |           "pg":{"port":5435}}}""".stripMargin
    assert(sameJson(H2ConfigJson.sanitize(js),
      """{"connectionUri":"h2:file:~/sample;<REDACTED>",
        | "server":{"init":{"script":"<REDACTED>","password":"<REDACTED>"},
        |           "tcp":null,
        |           "pg":{"port":5435,"allowOthers":false}}}""".stripMargin))
  }

  test("malformed configs sanitize to the empty object") {
    assert(H2ConfigJson.sanitize("not json at all{{{") == "{}")
    assert(H2ConfigJson.sanitize("""["an","array"]""") == "{}")
    assert(H2ConfigJson.sanitize("""{"server":null}""") == "{}")                 // missing connectionUri
    assert(H2ConfigJson.sanitize("""{"connectionUri":42}""") == "{}")            // wrong type
    assert(H2ConfigJson.sanitize("""{"connectionUri":"h2:mem:x","server":"s"}""") == "{}")
    assert(H2ConfigJson.sanitize(
      """{"connectionUri":"h2:mem:x","server":{"tcp":{"port":"high"}}}""") == "{}")
    // Fractional port must fail the strict decode, not truncate to 9092.
    assert(H2ConfigJson.sanitize(
      """{"connectionUri":"h2:mem:x","server":{"tcp":{"port":9092.7}}}""") == "{}")
  }

  test("decode defaults: absent and null optionals agree; allowOthers defaults false") {
    val a = H2ConfigJson.decode("""{"connectionUri":"h2:mem:x"}""")
    val b = H2ConfigJson.decode("""{"connectionUri":"h2:mem:x","server":null}""")
    assert(a == b && a == Right(H2Config("h2:mem:x")))
    val c = H2ConfigJson.decode(
      """{"connectionUri":"h2:mem:x","server":{"tcp":{"port":9092}}}""")
    assert(c == Right(H2Config("h2:mem:x",
      Some(ServerConfig(None, Some(TcpConfig(Some(9092), false)), None)))))
  }

  test("decode/encode round-trips a full config") {
    val cfg = H2Config("h2:file:/db;USER=sa",
      Some(ServerConfig(
        Some(InitConfig("RUNSCRIPT", Some("pw"))),
        Some(TcpConfig(Some(9092), true)),
        None)))
    assert(H2ConfigJson.decode(H2ConfigJson.encode(cfg)) == Right(cfg))
  }
}
