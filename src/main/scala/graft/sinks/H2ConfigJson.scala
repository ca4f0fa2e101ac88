package graft.sinks

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** JSON codec + sanitize for [[H2Config]], mirroring the reference's
  * destination-config layer:
  *
  *   - `Config.codecJson` / `ServerConfig.codecJson` (Config.scala:41–42,
  *     ServerConfig.scala:45–57): strict decode — a malformed or
  *     wrong-typed document fails as a whole;
  *   - `sanitizeDestinationConfig` (H2DestinationModule.scala:54–57):
  *     decode → `.sanitized` → re-encode, and ANY decode failure collapses
  *     to the empty object `{}` so no fragment of an unparseable (and
  *     possibly secret-bearing) config ever escapes;
  *   - absent and explicitly-null optional fields decode identically, and
  *     re-encode as explicit `null`s (the reference's argonaut codec
  *     behavior asserted by H2DestinationModuleSpec.scala:78–82, 116–130).
  *
  * The JSON surface carries the connection + server shape only;
  * engine-tuning fields (`numPartitions`, `batchSize`, `driverClass`) are
  * code-level knobs with defaults, exactly as the reference keeps its pool
  * size out of the user config. Jackson is used tree-level (it ships with
  * Spark); no extra dependency.
  */
object H2ConfigJson {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  /** Strict decode; Left is a human-readable path + reason. */
  def decode(json: String): Either[String, H2Config] = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception => return Left(s"malformed JSON: ${e.getMessage}") }
    if (root == null || !root.isObject) Left("config must be a JSON object")
    else
      for {
        uri    <- reqString(root, "connectionUri")
        server <- optObject(root, "server").flatMap {
          case None    => Right(None)
          case Some(s) => decodeServer(s).map(Some(_))
        }
      } yield H2Config(uri, server)
  }

  private def decodeServer(n: JsonNode): Either[String, ServerConfig] =
    for {
      init <- optObject(n, "init").flatMap {
        case None    => Right(None)
        case Some(i) => decodeInit(i).map(Some(_))
      }
      tcp <- optObject(n, "tcp").flatMap {
        case None    => Right(None)
        case Some(t) => decodeEndpoint(t, "tcp").map { case (p, a) => Some(TcpConfig(p, a)) }
      }
      pg <- optObject(n, "pg").flatMap {
        case None    => Right(None)
        case Some(p) => decodeEndpoint(p, "pg").map { case (po, a) => Some(PgConfig(po, a)) }
      }
    } yield ServerConfig(init, tcp, pg)

  private def decodeInit(n: JsonNode): Either[String, InitConfig] =
    for {
      script   <- reqString(n, "script")
      password <- optString(n, "server.init.password", n.get("password"))
    } yield InitConfig(script, password)

  private def decodeEndpoint(n: JsonNode, at: String): Either[String, (Option[Int], Boolean)] =
    for {
      port <- n.get("port") match {
        case null                 => Right(None)
        case p if p.isNull        => Right(None)
        case p if p.isIntegralNumber && p.canConvertToInt => Right(Some(p.intValue))
        case _                    => Left(s"server.$at.port must be an integer")
      }
      allow <- n.get("allowOthers") match {
        case null               => Right(false)
        case b if b.isNull      => Right(false)
        case b if b.isBoolean   => Right(b.booleanValue)
        case _                  => Left(s"server.$at.allowOthers must be a boolean")
      }
    } yield (port, allow)

  private def reqString(n: JsonNode, field: String): Either[String, String] =
    n.get(field) match {
      case null              => Left(s"missing field: $field")
      case v if v.isTextual  => Right(v.textValue)
      case _                 => Left(s"$field must be a string")
    }

  private def optString(n: JsonNode, at: String, v: JsonNode): Either[String, Option[String]] =
    v match {
      case null             => Right(None)
      case x if x.isNull    => Right(None)
      case x if x.isTextual => Right(Some(x.textValue))
      case _                => Left(s"$at must be a string")
    }

  /** Absent object field and explicit null both decode as None. */
  private def optObject(n: JsonNode, field: String): Either[String, Option[JsonNode]] =
    n.get(field) match {
      case null             => Right(None)
      case v if v.isNull    => Right(None)
      case v if v.isObject  => Right(Some(v))
      case _                => Left(s"$field must be an object")
    }

  /** Re-encode with explicit nulls for every absent optional field. */
  def encode(c: H2Config): String = {
    val root = nf.objectNode()
    root.put("connectionUri", c.connectionUri)
    c.server match {
      case None => root.putNull("server")
      case Some(s) =>
        val sn = root.putObject("server")
        s.init match {
          case None => sn.putNull("init")
          case Some(i) =>
            val in = sn.putObject("init")
            in.put("script", i.script)
            i.password match {
              case None    => in.putNull("password")
              case Some(p) => in.put("password", p)
            }
        }
        def endpoint(name: String, port: Option[Int], allow: Boolean): Unit = {
          val en = sn.putObject(name)
          port match {
            case None    => en.putNull("port")
            case Some(p) => en.put("port", p)
          }
          en.put("allowOthers", allow)
          ()
        }
        s.tcp match {
          case None    => sn.putNull("tcp")
          case Some(t) => endpoint("tcp", t.port, t.allowOthers)
        }
        s.pg match {
          case None    => sn.putNull("pg")
          case Some(p) => endpoint("pg", p.port, p.allowOthers)
        }
    }
    mapper.writeValueAsString(root)
  }

  /** `sanitizeDestinationConfig`: decode → redact → re-encode;
    * malformed ⇒ `{}`. */
  def sanitize(json: String): String =
    decode(json).fold(_ => "{}", c => encode(c.sanitized))
}
