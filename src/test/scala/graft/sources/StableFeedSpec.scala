package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The streaming commit feed's FINALITY cap (advice-r18 low): offsets
  * are commit seqs and only grow, so a commit that retro-fills BELOW a
  * checkpointed offset would be skipped forever. The micro-batch source
  * therefore never advances past a live unconsumed claim
  * ([[ManifestFileSink.stableSeqCeiling]]): the stalled writer's commit
  * lands ABOVE the held-back boundary, where the next trigger reads it
  * exactly once. */
class StableFeedSpec extends SparkTestBase {

  private val fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_stablefeed_")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("commit feed halts under a live claim, resumes exactly-once after it clears") {
    import spark.implicits._
    val tableDir = freshDir()
    val ckpt = freshDir()
    val outDir = freshDir()
    def append(id: Long): Unit =
      Seq(id).toDF("id").coalesce(1)
        .write.format(fmt).option("path", tableDir).mode("append").save()
    def drain(): Unit = {
      val q = spark.readStream.format(fmt).option("path", tableDir).load()
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
    }
    def consumed(): Seq[Long] =
      spark.read.parquet(outDir).select(col("id")).collect()
        .map(_.getLong(0)).toSeq.sorted

    append(1L) // seq 1
    append(2L) // seq 2
    // A writer claims the next seq and stalls in its claim→rename window.
    Files.createDirectories(Paths.get(tableDir, "_commits"))
    val stalled = Paths.get(tableDir, "_commits", f"${3L}%020d")
    Files.createFile(stalled)
    append(3L) // a faster claimant publishes at seq 4
    // The drain stops UNDER the live claim: only seqs 1–2 are final.
    drain()
    assert(consumed() === Seq(1L, 2L),
      "the feed must not seal an offset above a live in-flight claim")
    // The stalled writer dies; once the claim ages past the TTL it is
    // presumed dead and the held commit is admitted — exactly once, no
    // replay of 1–2. (Backdate the marker an hour.)
    Files.setLastModifiedTime(stalled,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600000L))
    drain()
    assert(consumed() === Seq(1L, 2L, 3L),
      "the held-back commit must arrive exactly once after the claim clears")
  }
}
