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
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic fake
  * dimensions/features from the bytes. Everything around it — the schema,
  * the binary carriage, the `mapPartitions` batch shape (one codec init
  * per partition, the reason mapPartitions and not map), partitioning, and
  * the metadata pushdown — is real and tested. Swap [[decodeStub]] for a
  * JNI/FFmpeg/ImageIO call and nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("durationMs", LongType))))))

  /** STUB for the real codec: deterministic pseudo-decode of a blob.
    * A real implementation would hand `bytes` to ImageIO/FFmpeg here. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
    MediaMeta(
      kind = if ((h & 1) == 0) "image" else "audio",
      width = 64 + (math.abs(h) % 1920).toInt,
      height = 64 + (math.abs(h >> 11) % 1080).toInt,
      durationMs = math.abs(h >> 21) % 600000)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("multimodal_meta" -> metaQuery)
  val oracles: Map[String, String] =
    Map("multimodal_meta" -> metaQuerySql)
}
