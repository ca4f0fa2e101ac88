package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** DSv2 catalog FUNCTIONS (the third leg of the catalog trio next to
  * tables and procedures): vector math callable straight from SQL —
  *
  * {{{
  *   SELECT graft.dot(a, b), graft.cosine(a, b) FROM pairs
  * }}}
  *
  * Both bind as `(array<double>, array<double>) → double`; Spark's V2
  * function resolution inserts the float→double array cast for
  * `array<float>` embedding columns at analysis time, so the same
  * function serves the embeddings table directly. `produceResult`
  * iterates the two ArrayData buffers with zero boxing beyond the
  * return value; the fold order is the array order on both engines —
  * the same determinism contract as
  * [[graft.functions.VectorExpressions]], which remains the codegen
  * path for the engine's own operators (a catalog function is the
  * USER door, not a replacement).
  *
  * NULL semantics: any NULL input (or mismatched lengths) yields NULL,
  * SQL's strict-function convention. */
private[sources] object GraftFunctions {

  val Names: Seq[String] = Seq("dot", "cosine", "bucket")

  def load(name: String): UnboundFunction = name match {
    case "dot"    => new VectorBinaryFunction("dot", cosine = false)
    case "cosine" => new VectorBinaryFunction("cosine", cosine = true)
    case "bucket" => GraftBucketFunction
    case other => throw new UnsupportedOperationException(
      s"unknown function $other; available: ${Names.mkString(", ")}")
  }
}

/** The V2 `bucket` function — what lets Spark RESOLVE the catalog's
  * `bucket(n, col)` partition transform ([[V2ScanPartitioning]] looks the
  * transform's function up in the table's FunctionCatalog) and therefore
  * plan storage-partitioned joins between co-bucketed tables: two scans
  * whose `KeyGroupedPartitioning` carry transforms with the SAME bound
  * function (`canonicalName` equality) and matching bucket ids join with
  * zero exchanges on a HIGH-cardinality key, where an identity layout
  * would demux one file per value. The id computation delegates to
  * [[ManifestFileSink.bucketIdOf]] — the exact function the demux writer
  * attested each file with, so the function, the layout, and the scan
  * report can never disagree. */
private[sources] object GraftBucketFunction extends UnboundFunction {
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) -> deterministic Murmur3 bucket id in [0, n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 && inputType.fields(0).dataType == IntegerType,
      s"bucket takes (int numBuckets, value); got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    dt match {
      case LongType | IntegerType | StringType =>
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported value type ${other.simpleString} (BIGINT/INT/STRING)")
    }
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v: Any = dt match {
          case LongType    => input.getLong(1)
          case IntegerType => input.getInt(1)
          case StringType  => input.getUTF8String(1)
          case _           => throw new IllegalStateException("unreachable")
        }
        ManifestFileSink.bucketIdOf(dt, v, n)
      }
    }
  }
}

private[sources] class VectorBinaryFunction(fname: String, cosine: Boolean)
  extends UnboundFunction with ScalarFunction[java.lang.Double] {

  override def name(): String = fname
  override def description(): String =
    s"$fname(array<double>, array<double>) -> double"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2, s"$fname takes exactly two array arguments")
    this
  }

  override def inputTypes(): Array[DataType] =
    Array(ArrayType(DoubleType), ArrayType(DoubleType))
  override def resultType(): DataType = DoubleType
  override def isResultNullable: Boolean = true
  override def isDeterministic: Boolean = true
  override def canonicalName(): String = s"graft.$fname"

  override def produceResult(input: InternalRow): java.lang.Double = {
    if (input.isNullAt(0) || input.isNullAt(1)) return null
    val a = input.getArray(0)
    val b = input.getArray(1)
    if (a.numElements() != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      if (cosine) { na += x * x; nb += y * y }
      i += 1
    }
    if (!cosine) dot
    else if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
