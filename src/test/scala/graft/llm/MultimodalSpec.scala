package graft.llm

import graft.SparkTestBase

/** Exercises the multimodal plumbing: binary carriage through parquet,
  * partition-parallel feature extraction, resize/frame-sample shapes. */
class MultimodalSpec extends SparkTestBase {

  private def mediaDS = {
    import spark.implicits._
    spark.createDataset(Seq(
      MediaRow(1, "image", "hello world".getBytes("UTF-8"), Multimodal.decode("hello world".getBytes("UTF-8"))),
      MediaRow(2, "video", ("frame" * 100).getBytes("UTF-8"), MediaMeta("video", 640, 480, 32000)),
      MediaRow(3, "audio", null, MediaMeta("audio", 0, 0, 5000))))
  }

  test("binary columns roundtrip through parquet with typed metadata") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/t"
    mediaDS.repartition(2).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaRow].collect().sortBy(_.media_id)
    assert(back.length == 3)
    assert(new String(back(0).bytes, "UTF-8") == "hello world")
    assert(back(2).bytes == null && back(2).meta.durationMs == 5000)
  }

  test("feature extraction runs per-partition and is deterministic") {
    val feats = Multimodal.extractFeatures(mediaDS.repartition(3))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 11 && feats(2).n_bytes == 0)
    // determinism across reruns/partitionings
    val again = Multimodal.extractFeatures(mediaDS.repartition(1))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(feats(0).feature.toSeq == again(0).feature.toSeq)
  }

  test("non-image fallback decode is deterministic and total") {
    val a = Multimodal.decode("abc".getBytes)
    assert(a == Multimodal.decode("abc".getBytes))
    assert(a.width >= 64 && a.height >= 64)
    // null bytes (nullable blob column) → sentinel, not an executor NPE
    assert(Multimodal.decode(null) == MediaMeta("unknown", 0, 0, 0L))
  }

  test("PNG IHDR header parses to real dimensions") {
    import graft.functions.ImageHeader
    assert(ImageHeader.decode(Multimodal.synthPng(1920, 1080)) == ("png", 1920, 1080))
    assert(ImageHeader.decode(Multimodal.synthPng(1, 1)) == ("png", 1, 1))
    // width beyond 2^15 exercises the unsigned big-endian read
    assert(ImageHeader.decode(Multimodal.synthPng(65535, 3)) == ("png", 65535, 3))
    assert(Multimodal.decode(Multimodal.synthPng(64, 32)) ==
      MediaMeta("image", 64, 32, 0L))
    // truncated signature / mangled IHDR → not a PNG
    assert(ImageHeader.decode(Multimodal.synthPng(10, 10).take(20)) == null)
    val bad = Multimodal.synthPng(10, 10); bad(13) = 'X'.toByte
    assert(ImageHeader.decode(bad) == null)
  }

  test("JPEG SOF header parses through the marker-segment walk") {
    import graft.functions.ImageHeader
    // synthJpeg puts an APP0 before SOF0 — the walk must skip it
    assert(ImageHeader.decode(Multimodal.synthJpeg(640, 480)) == ("jpeg", 640, 480))
    assert(ImageHeader.decode(Multimodal.synthJpeg(16383, 1)) == ("jpeg", 16383, 1))
    // SOI+EOI with no frame header → unknown
    assert(ImageHeader.decode(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == null)
    // truncated mid-segment → null, not an exception
    assert(ImageHeader.decode(Multimodal.synthJpeg(640, 480).take(10)) == null)
    // arbitrary junk and empty input are inert
    assert(ImageHeader.decode("not an image at all".getBytes) == null)
    assert(ImageHeader.decode(Array.emptyByteArray) == null)
    assert(ImageHeader.decode(null) == null)
  }

  test("graft_image_meta expression decodes scan-fused, null-safe") {
    import org.apache.spark.sql.functions._
    import graft.functions.ImageFunctions.imageMeta
    val rows = Seq(
      (1L, Multimodal.synthPng(300, 200)),
      (2L, Multimodal.synthJpeg(64, 128)),
      (3L, "plain text".getBytes("UTF-8")),
      (4L, null))
    val df = spark.createDataFrame(rows).toDF("id", "bytes")
      .select(col("id"), imageMeta(col("bytes")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy(col("id"))
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
       if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, "png", 300, 200), (2L, "jpeg", 64, 128),
      (3L, "unknown", -1, -1), (4L, null, -1, -1)))
  }

  test("WAV RIFF header parses through the chunk walk") {
    import graft.functions.AudioHeader
    // synthWav puts an odd-sized LIST chunk before fmt — the walk must
    // skip it AND honor the RIFF pad byte to stay marker-aligned
    assert(AudioHeader.decode(Multimodal.synthWav(2, 44100, 16, 44100)) ==
      (2, 44100, 16, 1000L))
    // duration = declared data bytes * 1000 / byteRate, integer ms
    assert(AudioHeader.decode(Multimodal.synthWav(1, 8000, 8, 12345)) ==
      (1, 8000, 8, 12345L * 1000 / 8000))
    // mono 32-bit at a non-multiple rate exercises the floor
    assert(AudioHeader.decode(Multimodal.synthWav(1, 11025, 32, 999)) ==
      (1, 11025, 32, 999L * 4 * 1000 / (11025L * 4)))
    // not RIFF / truncated / junk → null, not an exception
    assert(AudioHeader.decode("RIFFxxxx not wave".getBytes) == null)
    assert(AudioHeader.decode(Multimodal.synthWav(2, 44100, 16, 100).take(11)) == null)
    assert(AudioHeader.decode(Multimodal.synthWav(2, 44100, 16, 100).take(30)) == null)
    assert(AudioHeader.decode("definitely not audio".getBytes) == null)
    assert(AudioHeader.decode(Array.emptyByteArray) == null)
    assert(AudioHeader.decode(null) == null)
    // fmt present but no data chunk → null (no duration derivable)
    val noData = Multimodal.synthWav(2, 44100, 16, 100).dropRight(8)
    assert(AudioHeader.decode(noData) == null)
  }

  test("graft_audio_meta expression decodes scan-fused, null-safe") {
    import org.apache.spark.sql.functions._
    import graft.functions.AudioFunctions.audioMeta
    val rows = Seq(
      (1L, Multimodal.synthWav(2, 44100, 16, 22050)),
      (2L, "plain text".getBytes("UTF-8")),
      (3L, null))
    val df = spark.createDataFrame(rows).toDF("id", "bytes")
      .select(col("id"), audioMeta(col("bytes")).as("m"))
      .select(col("id"), col("m.format"), col("m.channels"),
        col("m.sample_rate"), col("m.bits"), col("m.duration_ms"))
      .orderBy(col("id"))
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
       if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3),
       if (r.isNullAt(4)) -1 else r.getInt(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "wav", 2, 44100, 16, 500L),
      (2L, "unknown", -1, -1, -1, -1L), (3L, null, -1, -1, -1, -1L)))
  }

  test("resize updates metadata, preserves ids") {
    val out = Multimodal.resize(mediaDS, 224, 224).collect().sortBy(_.media_id)
    assert(out.forall(r => r.meta.width == 224 && r.meta.height == 224))
  }

  test("frame sampling flatMaps video blobs") {
    val frames = Multimodal.sampleFrames(mediaDS, everyN = 8).collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(2L).length == 4)  // 32 frames / every 8
    assert(byId(3L).length == 1)  // 5 "frames", one sample (empty bytes)
  }
}
