package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverPropertyInfo, SQLException}
import java.util.Properties

/** TEST-ONLY recording JDBC stack: a real `java.sql.Driver` that accepts
  * `jdbc:h2:` URLs and records every statement instead of executing it —
  * so [[H2Sink.write]] can be driven through Spark's ACTUAL JDBC write
  * path (DriverRegistry → ConnectionProvider → per-partition batched
  * inserts) without the H2 jar, verifying DDL emission, identifier
  * quoting, drop-then-create ordering, and insert batching against the
  * reference's semantics (H2CsvCreateSink.scala:54–58, 106–126).
  *
  * The JDBC surface is a handful of `java.lang.reflect.Proxy`s: only the
  * methods Spark's writer touches are interpreted; everything else
  * returns a type-appropriate default. One process-wide "database"
  * ([[RecordingDb]]) is shared by all connections, since Spark opens one
  * connection per partition.
  */
object RecordingDb {

  /** Every statement in arrival order; batched inserts appear as
    * `BATCH[n]: <sql>`, commits as `COMMIT`. */
  private val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  /** Row store per table, rows in table-column order (values as set by the
    * writer's setXxx calls) — lets the read path serve real data back. */
  private val data =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CopyOnWriteArrayList[Array[AnyRef]]]()

  def reset(): Unit = { log.clear(); tables.clear(); data.clear() }
  def statements: List[String] = {
    val it = log.iterator(); val b = List.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
  def tableNames: Set[String] = {
    val it = tables.keySet.iterator(); val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def record(s: String): Unit = log.add(s)
  private def unq(ident: String): String = ident.replace("\"\"", "\"")

  // Split a column-DDL body on top-level commas (commas inside quoted
  // idents or parens — TIME(9), adversarial names — must not split).
  private def splitCols(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false; var depth = 0; var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '"') { inQ = !inQ; cur += c }
      else if (!inQ && c == '(') { depth += 1; cur += c }
      else if (!inQ && c == ')') { depth -= 1; cur += c }
      else if (!inQ && depth == 0 && c == ',') { out += cur.result().trim; cur.clear() }
      else cur += c
      i += 1
    }
    if (cur.nonEmpty) out += cur.result().trim
    out.result()
  }

  /** Leading quoted ident of a column DDL fragment. */
  private def colName(fragment: String): String = {
    require(fragment.startsWith("\""), s"unquoted column ident in DDL: $fragment")
    var i = 1; val sb = new StringBuilder
    while (i < fragment.length) {
      val c = fragment.charAt(i)
      if (c == '"') {
        if (i + 1 < fragment.length && fragment.charAt(i + 1) == '"') { sb += '"'; i += 2 }
        else return sb.result()
      } else { sb += c; i += 1 }
    }
    sb.result()
  }

  private val CreateRe = "(?s)^\\s*CREATE TABLE (\"(?:[^\"]|\"\")*\") \\((.*)\\)\\s*$".r
  private val DropIfRe = "^\\s*DROP TABLE IF EXISTS (\"(?:[^\"]|\"\")*\")\\s*$".r
  private val DropRe   = "^\\s*DROP TABLE (\"(?:[^\"]|\"\")*\")\\s*$".r
  private val RenameRe = "^\\s*ALTER TABLE (\"(?:[^\"]|\"\")*\") RENAME TO (\"(?:[^\"]|\"\")*\")\\s*$".r
  private val FromRe   = "(?s)^\\s*SELECT .*? FROM (\"(?:[^\"]|\"\")*\").*$".r

  def executeUpdate(sql: String): Int = {
    record(sql)
    sql match {
      case CreateRe(t, body) =>
        val name = unq(t.substring(1, t.length - 1))
        if (tables.containsKey(name)) throw new SQLException(s"table already exists: $name")
        tables.put(name, splitCols(body).map(colName))
        data.put(name, new java.util.concurrent.CopyOnWriteArrayList[Array[AnyRef]]())
        0
      case DropIfRe(t) =>
        val name = unq(t.substring(1, t.length - 1))
        tables.remove(name); data.remove(name); 0
      case DropRe(t) =>
        val name = unq(t.substring(1, t.length - 1))
        if (tables.remove(name) == null)
          throw new SQLException(s"table not found: $t")
        data.remove(name); 0
      // H2 rename semantics: source must exist, target must not.
      case RenameRe(f, t) =>
        val from = unq(f.substring(1, f.length - 1))
        val to = unq(t.substring(1, t.length - 1))
        if (!tables.containsKey(from)) throw new SQLException(s"table not found: $from")
        if (tables.containsKey(to)) throw new SQLException(s"table already exists: $to")
        tables.put(to, tables.remove(from))
        data.put(to, data.remove(from))
        0
      case _ => 0
    }
  }

  private val InsertRe = "(?s)^\\s*INSERT INTO (\"(?:[^\"]|\"\")*\") \\((.*?)\\) VALUES.*$".r

  /** (table name, table-position per insert-statement parameter). */
  def insertTarget(sql: String): (String, Seq[Int]) = sql match {
    case InsertRe(t, colList) =>
      val name = unq(t.substring(1, t.length - 1))
      val tableCols = tables.get(name)
      if (tableCols == null) throw new SQLException(s"table not found: $name")
      val positions = splitCols(colList).map(colName).map { c =>
        val i = tableCols.indexOf(c)
        if (i < 0) throw new SQLException(s"column not found: $c in $name")
        i
      }
      (name, positions)
    case _ => throw new SQLException(s"not an insert: $sql")
  }

  def appendRows(table: String, rows: Seq[Array[AnyRef]]): Unit =
    data.get(table).addAll(java.util.Arrays.asList(rows: _*))

  def rowsOf(table: String): Seq[Array[AnyRef]] = {
    val rs = data.get(table)
    if (rs == null) Seq.empty
    else { val b = Seq.newBuilder[Array[AnyRef]]; rs.forEach(r => b += r); b.result() }
  }

  /** SELECT interpretation: throw if the table is unknown; schema probes
    * (`WHERE 1=0`) return no rows; a bare projection serves the stored
    * rows projected to the selected columns. Metadata always carries the
    * selected column names. */
  private val StagePrefixRe =
    ("(?s)^\\s*SELECT TABLE_NAME FROM INFORMATION_SCHEMA\\.TABLES WHERE " +
     "SUBSTRING\\(TABLE_NAME, 1, (\\d+)\\) = '((?:[^']|'')*)' " +
     "AND TABLE_SCHEMA = SCHEMA\\(\\) AND TABLE_TYPE = 'BASE TABLE'\\s*$").r

  def executeQuery(sql: String): (Seq[String], Seq[Array[AnyRef]]) = sql match {
    // The sink's staging-GC catalog probe (H2Sink.writeBatch): serve the
    // table names with the given exact prefix, like H2's catalog would.
    case StagePrefixRe(len, lit) =>
      val prefix = lit.replace("''", "'")
      require(prefix.length == len.toInt, s"prefix length mismatch in: $sql")
      val names = tableNames.filter(_.startsWith(prefix)).toSeq.sorted
      (Seq("TABLE_NAME"), names.map(n => Array[AnyRef](n)))
    case FromRe(t) =>
      val name = unq(t.substring(1, t.length - 1))
      val cols = tables.get(name)
      if (cols == null) throw new SQLException(s"table not found: $name")
      val selectList = sql.substring(sql.indexOf("SELECT") + 6, sql.indexOf(" FROM")).trim
      val selected =
        if (selectList == "*" || selectList == "1") cols
        else splitCols(selectList).map(colName)
      if (sql.contains("WHERE 1=0") || selectList == "1") (selected, Seq.empty)
      else {
        val pos = selected.map(cols.indexOf)
        (selected, rowsOf(name).map(r => pos.map(r(_)).toArray))
      }
    case _ => (Seq.empty, Seq.empty)
  }

  def recordBatch(sql: String, n: Int): Unit = record(s"BATCH[$n]: $sql")
  def recordCommit(): Unit = record("COMMIT")

  // ------------------------------------------------------------- proxies

  private def dflt(rt: Class[_]): AnyRef = rt match {
    case java.lang.Boolean.TYPE   => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE   => Integer.valueOf(0)
    case java.lang.Long.TYPE      => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE     => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE      => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Double.TYPE    => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE     => java.lang.Float.valueOf(0.0f)
    case _                        => null
  }

  private def proxy[T](iface: Class[T])(pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
        val key = (m.getName, if (args == null) Array.empty[AnyRef] else args)
        m.getName match {
          case "toString" => s"Recording${iface.getSimpleName}"
          case "hashCode" => Integer.valueOf(System.identityHashCode(p))
          case "equals"   => java.lang.Boolean.valueOf(p eq args(0))
          case _ => if (pf.isDefinedAt(key)) pf(key) else dflt(m.getReturnType)
        }
      }
    }).asInstanceOf[T]

  private def resultSet(cols: Seq[String], rows: Seq[Array[AnyRef]]): java.sql.ResultSet = {
    lazy val rsmd: java.sql.ResultSetMetaData =
      proxy(classOf[java.sql.ResultSetMetaData]) {
        case ("getColumnCount", _)        => Integer.valueOf(cols.size)
        case ("getColumnName", a)         => cols(a(0).asInstanceOf[Integer] - 1)
        case ("getColumnLabel", a)        => cols(a(0).asInstanceOf[Integer] - 1)
        case ("getColumnType", _)         => Integer.valueOf(java.sql.Types.VARCHAR)
        case ("getColumnTypeName", _)     => "VARCHAR"
        case ("getPrecision", _)          => Integer.valueOf(255)
        case ("isNullable", _)            => Integer.valueOf(java.sql.ResultSetMetaData.columnNullable)
      }
    val cursor = new java.util.concurrent.atomic.AtomicInteger(-1)
    val sawNull = new java.util.concurrent.atomic.AtomicBoolean(false)
    def cell(i: Int): AnyRef = {
      val v = rows(cursor.get)(i - 1)
      sawNull.set(v == null)
      v
    }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _)        => java.lang.Boolean.valueOf(cursor.incrementAndGet() < rows.size)
      case ("getMetaData", _) => rsmd
      case ("getString", a) if a.length == 1 && a(0).isInstanceOf[Integer] =>
        val v = cell(a(0).asInstanceOf[Integer].intValue); if (v == null) null else v.toString
      case ("getObject", a) if a.length == 1 && a(0).isInstanceOf[Integer] =>
        cell(a(0).asInstanceOf[Integer].intValue)
      case ("wasNull", _)     => java.lang.Boolean.valueOf(sawNull.get)
    }
  }

  /** Literal rendering of a recorded parameter (mirrors what an H2 trace
    * would show) so specs can assert the VALUES a prepared batch carried:
    * strings quoted with '' doubling, NULL for null, toString otherwise. */
  private def renderParam(v: AnyRef): String = v match {
    case null                 => "NULL"
    case s: String            => "'" + s.replace("'", "''") + "'"
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case other                => other.toString
  }

  private def preparedStatement(sql: String): java.sql.PreparedStatement = {
    val isInsert = sql.trim.toUpperCase(java.util.Locale.ROOT).startsWith("INSERT")
    lazy val (targetTable, paramPos) = insertTarget(sql)
    lazy val width = tables.get(targetTable).size
    // Params keyed by 1-based parameter index for EVERY statement kind
    // (the keyed-MERGE sink prepares MERGE/DELETE, not just INSERT); the
    // insert data path maps them to table positions at executeBatch time.
    val current =
      new java.util.concurrent.atomic.AtomicReference[java.util.TreeMap[Integer, AnyRef]](null)
    val batch = new java.util.ArrayList[java.util.TreeMap[Integer, AnyRef]]()
    def row(): java.util.TreeMap[Integer, AnyRef] = {
      var r = current.get
      if (r == null) { r = new java.util.TreeMap[Integer, AnyRef](); current.set(r) }
      r
    }
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setNull", a) if a.length >= 1 && a(0).isInstanceOf[Integer] =>
        row().put(a(0).asInstanceOf[Integer], null); null
      case (setter, a) if setter.startsWith("set") &&
          setter != "setQueryTimeout" && setter != "setFetchSize" &&
          a != null && a.length >= 2 && a(0).isInstanceOf[Integer] =>
        row().put(a(0).asInstanceOf[Integer], a(1)); null
      case ("addBatch", a) if a.isEmpty =>
        batch.add(row()); current.set(null); null
      case ("executeBatch", _) =>
        val n = batch.size
        recordBatch(sql, n)
        batch.forEach { r =>
          val vals = new java.util.ArrayList[String]()
          r.values().forEach(v => vals.add(renderParam(v)))
          record(s"ROW: (${String.join(", ", vals)})")
        }
        if (isInsert && n > 0) {
          val rs = Seq.newBuilder[Array[AnyRef]]
          batch.forEach { r =>
            val arr = new Array[AnyRef](width)
            r.forEach((i, v) => arr(paramPos(i - 1)) = v)
            rs += arr
          }
          appendRows(targetTable, rs.result())
        }
        batch.clear()
        Array.fill(n)(1)
      case ("executeQuery", a) if a.isEmpty =>
        val (cols, rows) = executeQuery(sql); resultSet(cols, rows)
      case ("executeUpdate", a) if a.isEmpty => Integer.valueOf(executeUpdate(sql))
    }
  }

  private def statement(): java.sql.Statement =
    proxy(classOf[java.sql.Statement]) {
      case ("executeUpdate", a) => Integer.valueOf(executeUpdate(a(0).asInstanceOf[String]))
      case ("executeQuery", a)  =>
        val (cols, rows) = executeQuery(a(0).asInstanceOf[String]); resultSet(cols, rows)
      case ("execute", a)       => executeUpdate(a(0).asInstanceOf[String]); java.lang.Boolean.FALSE
    }

  private lazy val dbMeta: java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("supportsTransactions", _)                                    => java.lang.Boolean.TRUE
      case ("supportsDataDefinitionAndDataManipulationTransactions", _)   => java.lang.Boolean.TRUE
      case ("supportsTransactionIsolationLevel", _)                       => java.lang.Boolean.TRUE
      case ("getDatabaseProductName", _)                                  => "H2"
    }

  def connection(): Connection =
    proxy(classOf[Connection]) {
      case ("prepareStatement", a)        => preparedStatement(a(0).asInstanceOf[String])
      case ("createStatement", _)         => statement()
      case ("getMetaData", _)             => dbMeta
      case ("commit", _)                  => recordCommit(); null
      case ("isValid", _)                 => java.lang.Boolean.TRUE
      case ("getTransactionIsolation", _) => Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
    }
}

/** The registrable driver class (no-arg ctor for Spark's DriverRegistry). */
class RecordingDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:h2:")
  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) RecordingDb.connection() else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] = Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}
