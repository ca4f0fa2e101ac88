package graft.sinks

/** Optional embedded H2 server lifecycle, mirroring `H2Server`
  * (H2Server.scala:33–84): run an init script, start a TCP server, start a
  * PG-protocol server; each optional, all stopped on `close()`.
  *
  * The H2 driver jar is not bundled with Spark, so `org.h2.tools.*` is
  * reached reflectively: this class compiles and loads without H2 on the
  * classpath and fails with a clear message only when server startup is
  * actually requested. Mirrors the reference's semantics of swallowing
  * init-script failure as "already initialized" (H2Server.scala:54–57).
  */
final class H2Server private (servers: List[AnyRef]) extends AutoCloseable {
  override def close(): Unit = servers.foreach { s =>
    s.getClass.getMethod("stop").invoke(s)
  }
}

object H2Server {

  private def serverClass: Class[_] =
    try Class.forName("org.h2.tools.Server")
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalStateException(
          "org.h2.Driver is not on the classpath; add the H2 jar to use the embedded server")
    }

  /** Start the configured servers; returns a handle that stops them. */
  def start(config: ServerConfig, jdbcUrl: String, user: String = "sa",
            password: String = ""): H2Server = {
    val cls = serverClass

    config.init.foreach { init =>
      // RunScript.execute(url, user, password, scriptFile, UTF_8, false);
      // failure is swallowed: the database may already be initialized
      // (reference H2Server.scala:54–57).
      try {
        val file = java.nio.file.Files.createTempFile("graft-h2-init", ".sql")
        java.nio.file.Files.writeString(file, init.script)
        val rs = Class.forName("org.h2.tools.RunScript")
        rs.getMethod("execute", classOf[String], classOf[String], classOf[String],
            classOf[String], classOf[java.nio.charset.Charset], classOf[Boolean])
          .invoke(null, jdbcUrl, user, init.password.getOrElse(password),
            file.toString, java.nio.charset.StandardCharsets.UTF_8,
            java.lang.Boolean.FALSE)
        java.nio.file.Files.deleteIfExists(file)
      } catch { case scala.util.control.NonFatal(_) => () }
    }

    def startOne(create: String, port: Option[Int], allowOthers: Boolean): Option[AnyRef] = {
      val args = port.map(p => List("-" + create + "Port", p.toString)).getOrElse(Nil) ++
        (if (allowOthers) List("-" + create + "AllowOthers") else Nil)
      val m = cls.getMethod("create" + create.capitalize + "Server", classOf[Array[String]])
      val server = m.invoke(null, args.toArray)
      Some(server.getClass.getMethod("start").invoke(server))
    }

    val started =
      config.tcp.flatMap(t => startOne("tcp", t.port, t.allowOthers)).toList ++
      config.pg.flatMap(p => startOne("pg", p.port, p.allowOthers)).toList
    new H2Server(started)
  }
}
