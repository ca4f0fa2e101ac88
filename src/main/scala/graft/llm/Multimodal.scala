package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed metadata for an opaque media blob. */
final case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)

/** A media row: opaque bytes + typed metadata (the 100 TB-friendly layout:
  * blobs stay columnar-compressed in parquet, metadata is queryable). */
final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

/** Extracted features for a media item. */
final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                               checksum: Long, feature: Array[Float])

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode/feature-extract/resize/
  * frame-sample as partition-parallel transforms.
  *
  * IMAGE header decode is REAL: [[decode]] parses PNG IHDR / JPEG SOF
  * container headers ([[graft.functions.ImageHeader]], pure JVM, no
  * libraries) and the `multimodal_decode` query runs it scan-fused
  * through the `graft_image_meta` codegen expression, oracle-gated.
  * Pixel decode and the audio/video codecs remain STUBBED (no media
  * libraries in this environment): [[decode]] falls back to
  * deterministic fake dimensions for non-image bytes. Everything around
  * the stub — schema, binary carriage, the `mapPartitions` batch shape
  * (one codec init per partition, the reason mapPartitions and not map),
  * partitioning, metadata pushdown — is real and tested. Swap the
  * fallback for a JNI/FFmpeg call and nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("durationMs", LongType))))))

  /** Blob → metadata. PNG/JPEG bytes get REAL width/height from the
    * container header ([[graft.functions.ImageHeader]]); anything else
    * falls back to the deterministic pseudo-decode (the remaining honest
    * stub — audio/video codecs aren't available offline). */
  def decode(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null) return MediaMeta("unknown", 0, 0, 0L)
    graft.functions.ImageHeader.decode(bytes) match {
      case null =>
        val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
        MediaMeta(
          kind = if ((h & 1) == 0) "image" else "audio",
          width = 64 + (math.abs(h) % 1920).toInt,
          height = 64 + (math.abs(h >> 11) % 1080).toInt,
          durationMs = math.abs(h >> 21) % 600000)
      case (_, w, h) => MediaMeta(kind = "image", width = w, height = h, durationMs = 0L)
    }
  }

  /** Minimal-but-valid PNG header bytes (signature + IHDR; CRC zeroed —
    * irrelevant to header parsing). Written field-by-field from the spec,
    * deliberately NOT sharing code with the parser it tests. */
  def synthPng(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)   // 8 sig + 4 len + 4 type + 13 data + 4 crc
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0)
    bb.array()
  }

  /** Minimal-but-valid JPEG header bytes: SOI, a JFIF APP0 segment (so the
    * parser must WALK segments, not assume SOF first), SOF0, EOI. */
  def synthJpeg(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 18 + 19 + 2)
    bb.put(0xff.toByte).put(0xd8.toByte)                      // SOI
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(16)         // APP0, len 16
    bb.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    bb.put(1.toByte).put(1.toByte).put(0.toByte)              // version, units
    bb.putShort(72).putShort(72).put(0.toByte).put(0.toByte)  // density, thumb
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(17)         // SOF0, len 8+3*3
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)  // precision, H, W
    bb.put(3.toByte)                                          // 3 components
    for (c <- 1 to 3) { bb.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    bb.put(0xff.toByte).put(0xd9.toByte)                      // EOI
    bb.array()
  }

  /** Minimal-but-valid WAV header bytes: RIFF/WAVE, then a junk `LIST`
    * chunk with an ODD declared size (so the parser must honor RIFF word
    * alignment and walk, not assume `fmt ` first), then `fmt `, then the
    * `data` chunk HEADER with its declared size but no payload — the
    * header-only prefix a real pipeline reads from a 100 MB blob. Written
    * field-by-field from the RIFF spec, deliberately NOT sharing code
    * with the parser it tests. */
  def synthWav(channels: Int, rate: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val byteRate = rate * blockAlign
    val dataSize = nSamples.toLong * blockAlign
    val junk = Array[Byte]('j', 'u', 'n', 'k', 0)            // odd size: 5 (+1 pad)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + junk.length + 1 + 8 + 16 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(4 + (8 + junk.length + 1) + (8 + 16) + 8 + dataSize.toInt)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                                            // PCM
    bb.putShort(channels.toShort).putInt(rate).putInt(byteRate)
    bb.putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize.toInt)
    bb.array()
  }

  /** Feature extraction over binary columns: one "codec" init per
    * partition, then streaming over rows — the mapPartitions batch shape a
    * real decoder needs (this is the Scala analog of mapInPandas: batched,
    * partition-local, no per-row setup). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // expensive codec/session init would happen HERE, once per partition
      val dim = 8
      rows.map { r =>
        val bytes = Option(r.bytes).getOrElse(Array.emptyByteArray)
        var checksum = 1125899906842597L
        bytes.foreach(b => checksum = checksum * 31 + (b & 0xff))
        // STUB embedding: deterministic projection of byte histogram
        val feat = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { feat(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, checksum, feat)
      }
    }
  }

  /** "Resize" stub: real work would re-encode bytes; the Spark-side
    * contract (binary in, binary out, metadata updated) is what's real. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Frame sampling stub for video blobs: emit every nth "frame" as a
    * (media_id, frame_no, frame_bytes) row — flatMap shape is real. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = (r.meta.durationMs / 1000L).toInt.min(32)
      (0 until nFrames by everyN).map { f =>
        val bytes = Option(r.bytes).getOrElse(Array.emptyByteArray)
        val slice = bytes.slice(f * 16, f * 16 + 16)  // stub "frame"
        (r.media_id, f, slice)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Build a media dataset from any (id, payload-string) source — used by
    * tests and the metadata query to exercise BinaryType end-to-end. */
  def fromStrings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      when(col(idCol) % 2 === 0, "image").otherwise("audio").as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"))

  /** Oracle-able metadata query over binary columns: byte length + md5. */
  def metaQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = graft.sources.Tables(s, dir).documents
    fromStrings(docs, "doc_id", "text")
      .select(col("media_id"), col("kind"),
        octet_length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("digest"))
      .orderBy(col("media_id"))
  }

  val metaQuerySql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents ORDER BY media_id""".stripMargin

  /** Oracle-gated REAL header decode: synthesize valid PNG/JPEG header
    * bytes per document (dimensions derived arithmetically from doc_id),
    * then recover the dimensions by PARSING the bytes with the scan-fused
    * `graft_image_meta` expression. The oracle recomputes the expected
    * dimensions from doc_id with the same arithmetic — synthesis (spec
    * field layout, ByteBuffer writes) and parse (offset reads, marker
    * walk) are independent code paths, so a bug in either breaks the
    * hash match. Scale shape: map-only, header-only reads, codegen-fused
    * into the scan — no shuffle, no UDF boxing. */
  def decodeQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    import graft.functions.ImageFunctions.imageMeta
    val media = graft.sources.Tables(s, dir).documents
      .select(col("doc_id")).as[Long]
      .map { id =>
        val w = 1 + (id % 509).toInt
        val h = 1 + (id % 383).toInt
        (id, if (id % 2 == 0) synthPng(w, h) else synthJpeg(w, h))
      }.toDF("media_id", "bytes")
    media.select(col("media_id"), imageMeta(col("bytes")).as("m"))
      .select(col("media_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"))
      .orderBy(col("media_id"))
  }

  val decodeQuerySql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(1 + doc_id % 509 AS INTEGER) AS width,
      |  CAST(1 + doc_id % 383 AS INTEGER) AS height
      |FROM documents ORDER BY media_id""".stripMargin

  /** Oracle-gated REAL WAV header decode, same construction as
    * [[decodeQuery]]: synthesize a valid RIFF/WAVE header per document
    * (format parameters derived arithmetically from doc_id), recover them
    * by PARSING the bytes with the scan-fused `graft_audio_meta`
    * expression ([[graft.functions.AudioHeader]]). The oracle recomputes
    * the expected values from doc_id — synthesis (little-endian
    * ByteBuffer writes, chunk layout) and parse (chunk walk, alignment,
    * byteRate arithmetic) are independent code paths. Scale shape:
    * map-only, header-only reads, codegen-fused — the `data` payload is
    * never touched, so duration extraction over a 100 TB audio corpus is
    * a metadata pass. */
  def audioQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    import graft.functions.AudioFunctions.audioMeta
    val rates = Array(8000, 11025, 16000, 22050, 44100)
    val allBits = Array(8, 16, 32)
    val media = graft.sources.Tables(s, dir).documents
      .select(col("doc_id")).as[Long]
      .map { id =>
        val ch = 1 + (id % 2).toInt
        (id, synthWav(ch, rates((id % 5).toInt), allBits((id % 3).toInt),
          1 + (id % 44100).toInt))
      }.toDF("media_id", "bytes")
    media.select(col("media_id"), audioMeta(col("bytes")).as("m"))
      .select(col("media_id"), col("m.format").as("format"),
        col("m.channels").as("channels"), col("m.sample_rate").as("sample_rate"),
        col("m.bits").as("bits"), col("m.duration_ms").as("duration_ms"))
      .orderBy(col("media_id"))
  }

  val audioQuerySql: String = {
    val rate = "CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 11025 WHEN 2 THEN 16000 WHEN 3 THEN 22050 ELSE 44100 END"
    val bits = "CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END"
    // duration mirrors the parser exactly: declared data bytes * 1000,
    // integer-divided by fmt byteRate (both engines: exact int64 math)
    s"""SELECT doc_id AS media_id, 'wav' AS format,
       |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
       |  CAST($rate AS INTEGER) AS sample_rate,
       |  CAST($bits AS INTEGER) AS bits,
       |  CAST(((1 + doc_id % 44100) * (1 + doc_id % 2) * ($bits // 8) * 1000)
       |    // (($rate) * (1 + doc_id % 2) * ($bits // 8)) AS BIGINT) AS duration_ms
       |FROM documents ORDER BY media_id""".stripMargin
  }

  /** Oracle-gated frame sampling in the DECLARATIVE shape: every-8th
    * 16-unit frame per document via `sequence` + `explode` — the lateral
    * unnest a real frame sampler compiles to, with no typed flatMap and
    * no JVM objects in the loop, so it stays inside whole-stage codegen
    * and scales as a narrow map + generate. Frames are character-sliced
    * here (byte-identical semantics in both engines; the byte-slicing
    * variant over binary columns is [[sampleFrames]], unit-tested) and
    * emitted as md5 digests. */
  def framesQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = graft.sources.Tables(s, dir).documents
    val nf = least(floor(length(col("text")) / 16), lit(32)).cast("int")
    docs.select(col("doc_id").as("media_id"), col("text"), nf.as("nf"))
      .filter(col("nf") >= 1)
      .select(col("media_id"), col("text"),
        explode(sequence(lit(0), col("nf") - 1, lit(8))).as("frame_no"))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        md5(encode(col("text").substr(col("frame_no") * 16 + 1, lit(16)), "UTF-8")).as("digest"))
      .orderBy(col("media_id"), col("frame_no"))
  }

  val framesQuerySql: String =
    """SELECT d.doc_id AS media_id, CAST(t.frame_no AS BIGINT) AS frame_no,
      |  md5(substring(d.text, CAST(t.frame_no*16+1 AS INTEGER), 16)) AS digest
      |FROM documents d,
      |  UNNEST(range(0, CAST(LEAST(length(d.text)//16, 32) AS BIGINT), 8)) AS t(frame_no)
      |WHERE length(d.text) >= 16
      |ORDER BY media_id, frame_no""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("multimodal_meta" -> metaQuery, "multimodal_decode" -> decodeQuery,
        "multimodal_frames" -> framesQuery, "multimodal_audio_meta" -> audioQuery)
  val oracles: Map[String, String] =
    Map("multimodal_meta" -> metaQuerySql, "multimodal_decode" -> decodeQuerySql,
        "multimodal_frames" -> framesQuerySql, "multimodal_audio_meta" -> audioQuerySql)
}
