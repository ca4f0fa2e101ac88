package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers matching the reference's ingestion semantics.
  *
  * The reference feeds H2 CSVREAD with headerless CSV in Quasar's dialect
  * (CsvSupport.scala:43–51): `,` delimiter, `"` quote, `"` escape (quote
  * doubling), `\r\n` terminator, QUOTE_MINIMAL — and H2 loads an empty
  * field as SQL NULL (H2DestinationSpec.scala:253–263). Schema is always
  * declared, never inferred (H2CsvCreateSink.scala:37–42).
  */
object Readers {

  /** Headerless declared-schema CSV in the reference dialect;
    * empty fields (quoted or not) become NULL. */
  def csv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("sep", ",")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("lineSep", "\r\n")
      .option("emptyValue", null)  // "" parses as NULL, like H2 CSVREAD
      .option("nullValue", "")
      .option("mode", "FAILFAST")
      .csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def json(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def jsonInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Columnar ORC source (Spark-native): same V2 pushdown/pruning as
    * parquet — predicates reach the scan as ORC search arguments. (Avro
    * is intentionally absent: the `spark-avro` connector jar is not on
    * this classpath.) */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
