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

/** Pure-JVM WAV (RIFF) container-header parsing — no codec libraries, just
  * the published byte layout (Microsoft/IBM Multimedia Programming
  * Interface and Data Specifications 1.0, 1991; the `WAVEFORMAT` layout):
  *
  *   - bytes 0–3 `RIFF`, 4–7 uint32le riff size, 8–11 `WAVE`;
  *   - then a chunk walk: [id: 4 ASCII bytes][size: uint32le][data,
  *     padded to even length];
  *   - the `fmt ` chunk data is formatTag(u16le) channels(u16le)
  *     sampleRate(u32le) byteRate(u32le) blockAlign(u16le)
  *     bitsPerSample(u16le);
  *   - the `data` chunk's declared size + the fmt byteRate give the
  *     duration without touching the payload.
  *
  * Header-only like [[ImageHeader]]: touches ≤ a few hundred bytes per
  * blob regardless of payload size (the `data` payload itself is never
  * read), so metadata extraction over a 100 TB audio column stays a
  * map-only pass at scan speed. The companion to the reference's typed
  * metadata carriage (quasar-destination-h2 carries only typed scalar
  * columns; blobs + typed metadata is this engine's extension surface).
  */
object AudioHeader {

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
    ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** (channels, sampleRate, bitsPerSample, durationMs), or null if the
    * bytes are not a recognized WAV container. Never throws on arbitrary
    * bytes. Duration is declared-data-size / byteRate (integer ms); a
    * `data` chunk whose payload is truncated or absent still yields its
    * declared duration — by design, so a header-only prefix read works. */
  def decode(b: Array[Byte]): (Int, Int, Int, Long) = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue) return null
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > b.length) return null
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
        if (channels <= 0 || rate <= 0 || bits <= 0 || byteRate <= 0) return null
      } else if (id == "data") {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (channels < 0 || dataSize < 0) return null
    (channels, rate, bits, dataSize * 1000L / byteRate)
  }

  /** Total variant for the expression: unrecognized bytes become
    * ("unknown", null, …) instead of a null struct, so downstream filters
    * can distinguish "not audio" from "bytes were NULL". */
  def decodeRow(b: Array[Byte]): InternalRow = decode(b) match {
    case null =>
      new GenericInternalRow(Array[Any](UTF8String.fromString("unknown"), null, null, null, null))
    case (ch, rate, bits, ms) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString("wav"), ch, rate, bits, ms))
  }

  val rowType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))
}

/** Scan-fused audio-header decode:
  * `binary → struct<format,channels,sample_rate,bits,duration_ms>`.
  * Runs inside whole-stage codegen as a static call on the unsafe bytes —
  * same rung of the customization ladder as [[ImageMeta]]. */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_meta requires binary, got $other")
  }

  override def dataType: DataType = AudioHeader.rowType

  override def prettyName: String = "graft_audio_meta"

  override def nullSafeEval(bytes: Any): Any =
    AudioHeader.decodeRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioHeader.decodeRow($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioFunctions {
  /** Column-level header decode backed by the codegen expression;
    * requires [[GraftExtensions]] on the session. */
  def audioMeta(bytes: Column): Column = call_function("graft_audio_meta", bytes)
}
