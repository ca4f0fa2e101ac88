package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, when, length}
import org.apache.spark.sql.types._

/** Errors mirroring the reference's failure modes. */
final case class NotAResource(path: Seq[String]) extends IllegalArgumentException(
  s"destination path must be exactly one segment, got: ${path.mkString("/")}")

final case class ColumnTypesNotSupported(types: List[ColType]) extends IllegalArgumentException(
  s"unsupported column types: ${types.map(_.name).mkString(", ")}")

/** The H2 overwrite sink — the Spark-native re-expression of the
  * reference's entire data path (`H2CsvCreateSink.apply`,
  * H2CsvCreateSink.scala:37–64):
  *
  *   reference                         | here
  *   ----------------------------------|----------------------------------
  *   path must be one segment (:66–70) | [[validateTableName]]
  *   per-column type check, all errors
  *     accumulated (:72–83)            | [[validateColumns]]
  *   columnTypeToH2 (:85–99)           | [[ColType.toH2Ddl]] / [[ddl]]
  *   spool CSV + CSVREAD CTAS (:50–58) | executor-parallel batched INSERTs
  *   DROP TABLE IF EXISTS + CREATE
  *     (:55–58, 125–126)               | SaveMode.Overwrite
  *   hygienicIdent (package.scala:42)  | [[H2Dialect.quoteIdentifier]]
  *   empty CSV field ⇒ NULL
  *     (H2DestinationSpec.scala:253)   | [[emptyStringsAsNull]]
  *
  * Scale: the reference loads over ONE connection; Spark's JDBC writer
  * opens one connection per partition with `batchsize`d inserts. For a
  * single-node H2 target, `numPartitions` caps fan-in at the reference's
  * pool size (10). Overwrite is DROP+CREATE (same weak atomicity as the
  * reference — H2 auto-commits DDL); `truncate=true` keeps the table when
  * the schema is unchanged.
  */
object H2Sink {

  val DefaultNumPartitions = 10   // reference ConnectionPoolSize (H2DestinationModule.scala:52)
  val DefaultBatchSize = 10000

  /** Reference rule: destination path is exactly one segment. */
  def validateTableName(path: Seq[String]): String = path match {
    case Seq(one) if one.nonEmpty => one
    case other                    => throw NotAResource(other)
  }

  /** Accumulate ALL unsupported column types before failing. */
  def validateColumns(cols: Seq[(String, ColType)]): Seq[(String, String)] = {
    val (bad, good) = cols.partitionMap { case (n, t) =>
      ColType.toH2Ddl(t) match {
        case Left(unsupported) => Left(unsupported)
        case Right(ddl)        => Right(n -> ddl)
      }
    }
    if (bad.nonEmpty) throw ColumnTypesNotSupported(bad.toList.distinct)
    good
  }

  /** `createTableColumnTypes` option value for a declared column list. */
  def ddl(cols: Seq[(String, ColType)]): String =
    validateColumns(cols).map { case (n, t) =>
      s"${H2Dialect.quoteIdentifier(n)} $t"
    }.mkString(", ")

  /** DDL derived from a DataFrame's Spark schema (undeclared push). */
  def ddlFromSchema(schema: StructType): String =
    ddl(schema.fields.toSeq.map(f => f.name -> ColType.fromSpark(f.dataType)))

  /** Reference semantics: an empty string loads as SQL NULL
    * (H2 CSVREAD behavior, asserted in H2DestinationSpec.scala:253–263). */
  def emptyStringsAsNull(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, when(length(col(f.name)) === 0, null).otherwise(col(f.name)))
    }

  /** Push `df` to H2 table `table` with full-overwrite semantics. */
  def write(df: DataFrame, table: String, config: H2Config,
            declared: Option[Seq[(String, ColType)]] = None): Unit = {
    H2Dialect.register()
    val name = validateTableName(table.split('/').toSeq.filter(_.nonEmpty))
    val types = declared.map(ddl).getOrElse(ddlFromSchema(df.schema))
    emptyStringsAsNull(df).write
      .format("jdbc")
      .mode(SaveMode.Overwrite)
      .option("url", config.jdbcUrl)
      .option("driver", "org.h2.Driver")
      .option("dbtable", H2Dialect.quoteIdentifier(name))
      .option("createTableColumnTypes", types)
      .option("numPartitions", config.numPartitions)
      .option("batchsize", config.batchSize)
      .option("isolationLevel", "READ_COMMITTED")
      .save()
  }

  /** Read a table back from H2 (the reference reads back only in tests;
    * for us it is a first-class source). */
  def read(spark: org.apache.spark.sql.SparkSession, table: String,
           config: H2Config): DataFrame = {
    H2Dialect.register()
    spark.read.format("jdbc")
      .option("url", config.jdbcUrl)
      .option("driver", "org.h2.Driver")
      .option("dbtable", H2Dialect.quoteIdentifier(table))
      .load()
  }
}
