package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image container-header parsing — no codec libraries, just the
  * published byte layouts:
  *
  *   - PNG (ISO/IEC 15948 §5.2, §11.2.2): 8-byte signature
  *     `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk whose first eight
  *     data bytes are width and height as big-endian uint32.
  *   - JPEG (ITU-T T.81 §B.2): `FF D8` (SOI), then a marker-segment walk;
  *     the frame header (SOF0–SOF15, minus DHT/JPG/DAC which share the
  *     0xC0 nibble) carries height then width as big-endian uint16 at
  *     offsets 3/5 of the segment payload.
  *
  * Used by [[ImageMeta]] (scan-fused expression) and by
  * [[graft.llm.Multimodal.decode]]. Header-only: touches ≤ a few hundred
  * bytes per blob regardless of blob size, so the scan stays I/O-bound.
  */
object ImageHeader {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
    ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (format, width, height), or null if the bytes are not a recognized
    * image container. Never throws on arbitrary bytes. */
  def decode(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    // PNG: signature + IHDR (always the first chunk, so fixed offsets).
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      // uint32 in the spec but capped at 2^31-1 by it too (§11.2.2)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        return ("png", w.toInt, h.toInt)
      return null
    }
    // JPEG: SOI then marker segments until a frame header.
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null     // lost marker sync
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 }                  // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 }  // standalone
        else if (m == 0xd9) return null            // EOI before any SOF
        else if (i + 3 >= b.length) return null    // truncated segment header
        else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            // payload: precision(1) height(2) width(2) ...
            if (segLen < 7 || i + 8 >= b.length) return null
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            if (w > 0 && h > 0) return ("jpeg", w, h)
            return null
          }
          i += 2 + segLen
        }
      }
      return null
    }
    null
  }

  /** Total variant for the expression: unrecognized bytes become
    * ("unknown", null, null) instead of a null struct, so downstream
    * filters can distinguish "not an image" from "bytes were NULL". */
  def decodeRow(b: Array[Byte]): InternalRow = decode(b) match {
    case null =>
      new GenericInternalRow(Array[Any](UTF8String.fromString("unknown"), null, null))
    case (fmt, w, h) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))
  }

  val rowType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))
}

/** Scan-fused image-header decode: `binary → struct<format,width,height>`.
  * Runs inside whole-stage codegen as a static call on the unsafe bytes —
  * no UDF boxing, no Python round-trip — so header extraction over a
  * 100 TB blob column is a map-only pass at scan speed. Rung (b) of the
  * customization ladder like [[DotProduct]]. */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_image_meta requires binary, got $other")
  }

  override def dataType: DataType = ImageHeader.rowType

  override def prettyName: String = "graft_image_meta"

  override def nullSafeEval(bytes: Any): Any =
    ImageHeader.decodeRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeader.decodeRow($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageFunctions {
  /** Column-level header decode backed by the codegen expression;
    * requires [[GraftExtensions]] on the session. */
  def imageMeta(bytes: Column): Column = call_function("graft_image_meta", bytes)
}
