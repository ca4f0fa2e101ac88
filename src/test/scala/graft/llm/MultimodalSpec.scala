package graft.llm

import graft.SparkTestBase

/** Exercises the multimodal plumbing: binary carriage through parquet,
  * partition-parallel feature extraction, resize/frame-sample shapes. */
class MultimodalSpec extends SparkTestBase {

  private def mediaDS = {
    import spark.implicits._
    spark.createDataset(Seq(
      MediaRow(1, "image", "hello world".getBytes("UTF-8"), Multimodal.decodeStub("hello world".getBytes("UTF-8"))),
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

  test("decode stub is deterministic and total") {
    val a = Multimodal.decodeStub("abc".getBytes)
    assert(a == Multimodal.decodeStub("abc".getBytes))
    assert(a.width >= 64 && a.height >= 64)
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
