package graft.sinks

/** Connection + optional embedded-server config, mirroring the reference's
  * `Config`/`ServerConfig` ADTs (Config.scala:25–43, ServerConfig.scala:24–57)
  * including their redaction rules:
  *   - everything after the first `;` in the connection URI is secrets
  *     (user/password live there in H2 URIs) ⇒ `;<REDACTED>`
  *     (Config.sanitizeUri, Config.scala:27–34);
  *   - server init `password` AND `script` are redacted
  *     (ServerConfig.scala:30).
  */
final case class H2Config(
    connectionUri: String,
    server: Option[ServerConfig] = None,
    numPartitions: Int = H2Sink.DefaultNumPartitions,
    batchSize: Int = H2Sink.DefaultBatchSize,
    driverClass: String = "org.h2.Driver") {

  /** `jdbc:` + configured URI (package.scala:50–51). */
  def jdbcUrl: String = s"jdbc:$connectionUri"

  def sanitized: H2Config =
    copy(connectionUri = H2Config.sanitizeUri(connectionUri),
      server = server.map(_.sanitized))
}

object H2Config {
  val Redacted = "<REDACTED>"

  /** Redact everything after the first `;`. */
  def sanitizeUri(uri: String): String = {
    val i = uri.indexOf(';')
    if (i < 0) uri else uri.substring(0, i) + ";" + Redacted
  }
}

final case class InitConfig(script: String, password: Option[String]) {
  def sanitized: InitConfig =
    InitConfig(H2Config.Redacted, password.map(_ => H2Config.Redacted))
}

final case class TcpConfig(port: Option[Int], allowOthers: Boolean = false)
final case class PgConfig(port: Option[Int], allowOthers: Boolean = false)

final case class ServerConfig(
    init: Option[InitConfig],
    tcp: Option[TcpConfig],
    pg: Option[PgConfig]) {
  def sanitized: ServerConfig = copy(init = init.map(_.sanitized))
}
