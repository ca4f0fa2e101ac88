package graft.sinks

import java.sql.Types
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Spark `JdbcDialect` for H2, giving the JDBC writer exact control over
  * identifier hygiene and DDL types.
  *
  * Identifier quoting reproduces the reference's only injection defense
  * (`hygienicIdent`, package.scala:42–43): wrap in double quotes and
  * double any embedded quote. The reference's adversarial tests (table
  * name `foobar; drop table really_important; …`, column `from nowhere;
  * drop table …`) pass through this unchanged as inert quoted idents.
  *
  * Type DDL mirrors `columnTypeToH2` (H2CsvCreateSink.scala:85–99) via
  * [[ColType]]; notably NUMERIC (unbounded) for decimals and TIMESTAMP(3)
  * precision for datetimes.
  */
object H2Dialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:h2")

  /** `hygienicIdent`: the reference's quoting rule, verbatim semantics. */
  override def quoteIdentifier(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType       => Some(JdbcType("TINYINT", Types.TINYINT))
    case BooleanType    => Some(JdbcType("BOOLEAN", Types.BOOLEAN))
    case DateType       => Some(JdbcType("DATE", Types.DATE))
    case TimestampNTZType => Some(JdbcType("TIMESTAMP(3)", Types.TIMESTAMP))
    case TimestampType  => Some(JdbcType("TIMESTAMP(3) WITH TIME ZONE", Types.TIMESTAMP_WITH_TIMEZONE))
    case _: DecimalType => Some(JdbcType("NUMERIC", Types.NUMERIC))
    case DoubleType     => Some(JdbcType("DOUBLE PRECISION", Types.DOUBLE))
    case FloatType      => Some(JdbcType("REAL", Types.FLOAT))
    case ShortType      => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case IntegerType    => Some(JdbcType("INTEGER", Types.INTEGER))
    case LongType       => Some(JdbcType("BIGINT", Types.BIGINT))
    case StringType     => Some(JdbcType("VARCHAR", Types.VARCHAR))
    case BinaryType     => Some(JdbcType("BINARY VARYING", Types.VARBINARY))
    case _              => None
  }

  /** Register once per JVM; safe to call repeatedly. */
  def register(): Unit = JdbcDialects.registerDialect(H2Dialect)
}
