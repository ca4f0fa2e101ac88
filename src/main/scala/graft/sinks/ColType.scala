package graft.sinks

import org.apache.spark.sql.types._

/** The destination column-type vocabulary: 11 scalar variants mirroring the
  * reference's `ColumnType.Scalar` (H2CsvCreateSink.scala:85–99), with
  * total mappings to Spark types and H2 DDL.
  *
  * Two variants (`OffsetDate`, `Interval`) are rejected by the reference
  * and by us; validation accumulates *all* offending columns before
  * failing (reference behavior via ValidatedNel, H2CsvCreateSink.scala:72–83).
  *
  * Type-fidelity decisions (SURVEY.md §7.4):
  *   - `LocalTime`/`OffsetTime`: no Spark time type — carried as ISO-8601
  *     strings; DDL stays TIME(9) [WITH TIME ZONE] so H2 parses them back.
  *   - `LocalDate`/`LocalDateTime` extremes (±999999999 years) exceed
  *     Spark's practical range — within Spark they are Date/TimestampNTZ;
  *     callers needing H2's full range carry strings.
  *   - `Number` is DecimalType(38,18) — H2 NUMERIC is unbounded, values
  *     beyond 38 digits must be carried as strings.
  */
sealed abstract class ColType(val name: String)

object ColType {
  case object CNull           extends ColType("NULL")
  case object CBoolean        extends ColType("BOOLEAN")
  case object CLocalTime      extends ColType("LOCALTIME")
  case object COffsetTime     extends ColType("OFFSETTIME")
  case object CLocalDate      extends ColType("LOCALDATE")
  case object COffsetDate     extends ColType("OFFSETDATE")
  case object CLocalDateTime  extends ColType("LOCALDATETIME")
  case object COffsetDateTime extends ColType("OFFSETDATETIME")
  case object CInterval       extends ColType("INTERVAL")
  case object CNumber         extends ColType("NUMBER")
  case object CString         extends ColType("STRING")

  val all: List[ColType] = List(CNull, CBoolean, CLocalTime, COffsetTime,
    CLocalDate, COffsetDate, CLocalDateTime, COffsetDateTime, CInterval,
    CNumber, CString)

  /** H2 DDL fragment per type; Left = unsupported (reference rejects). */
  def toH2Ddl(t: ColType): Either[ColType, String] = t match {
    case CNull           => Right("TINYINT")
    case CBoolean        => Right("BOOLEAN")
    case CLocalTime      => Right("TIME(9)")
    case COffsetTime     => Right("TIME(9) WITH TIME ZONE")
    case CLocalDate      => Right("DATE")
    case COffsetDate     => Left(COffsetDate)
    case CLocalDateTime  => Right("TIMESTAMP(3)")
    case COffsetDateTime => Right("TIMESTAMP(3) WITH TIME ZONE")
    case CInterval       => Left(CInterval)
    case CNumber         => Right("NUMERIC")
    case CString         => Right("VARCHAR")
  }

  /** In-engine Spark representation per type. */
  def toSpark(t: ColType): Either[ColType, DataType] = t match {
    case CNull           => Right(ByteType)        // all-NULL column, H2 TINYINT
    case CBoolean        => Right(BooleanType)
    case CLocalTime      => Right(StringType)      // ISO-8601 local time
    case COffsetTime     => Right(StringType)      // ISO-8601 offset time
    case CLocalDate      => Right(DateType)
    case COffsetDate     => Left(COffsetDate)
    case CLocalDateTime  => Right(TimestampNTZType)
    case COffsetDateTime => Right(TimestampType)
    case CInterval       => Left(CInterval)
    case CNumber         => Right(DecimalType(38, 18))
    case CString         => Right(StringType)
  }

  /** Best-effort reverse mapping for DataFrames arriving with plain Spark
    * types (how the JDBC writer decides DDL when no ColType is declared). */
  def fromSpark(dt: DataType): ColType = dt match {
    case NullType | ByteType                       => CNull
    case BooleanType                               => CBoolean
    case DateType                                  => CLocalDate
    case TimestampNTZType                          => CLocalDateTime
    case TimestampType                             => COffsetDateTime
    case _: NumericType                            => CNumber
    case StringType                                => CString
    case _                                         => CString
  }
}
