package graft.llm

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.ManifestFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The gated vector-admission contract (SemDeDup at ingest): per-epoch
  * same-cell cosine reject against base ∪ earlier admits, within-epoch
  * keep-first, decision atomic with its effects (ledger row in the same
  * WAP publish), replay idempotence via the ledger, and kill/restart
  * convergence through the checkpointed stream. */
class VecCurationSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val Tau = 0.45

  private def fmt = classOf[ManifestFileSink].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-veccur-dir").toString
    for (t <- Seq("embeddings", "documents"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$d/$t.parquet")
    d
  }

  private def embAll(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")

  private def assignedIds(base: String): Set[Long] =
    spark.read.format(fmt)
      .option("path", s"${VectorMaintenance.vecPath(base)}/assigned").load()
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

  /** Eager reference: assignments of EVERYTHING under base-trained
    * frozen centroids, then the gate unrolled against an explicit
    * standing id set. */
  private def reference(dir: String): (DataFrame, Array[(Long, Long, Double)]) = {
    val cents = Similarity.kmeansCentroids(
      Similarity.normalizedDf(embAll(dir).filter(col("vec_id") % 13 =!= 6)))
    val af = Similarity.kmeansAssign(Similarity.normalizedDf(embAll(dir)), cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = af.as("a").join(af.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        graft.functions.VectorFunctions.dotp(col("a.vn"), col("b.vn")).as("cs"))
      .filter(col("cs") >= Tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    (af, pairs)
  }

  private def expectedAdmits(pairs: Array[(Long, Long, Double)],
      standing: Set[Long], epoch: Set[Long]): Set[Long] =
    epoch.filterNot { x =>
      pairs.exists { case (a, b, _) =>
        a == x && (standing(b) || (epoch(b) && b < x)) }
    }

  test("gated epochs admit exactly the sequential reference; ledger decides replays") {
    val dir = freshDir()
    val base = VectorMaintenance.ensureBaseAt(spark, dir,
      Files.createTempDirectory("graft-veccur-base").toString)
    val base0 = assignedIds(base)
    val c6 = embAll(dir).filter(col("vec_id") % 13 === 6)
    val e0 = c6.filter(expr("(vec_id div 13) % 2 = 0"))
    val e1 = c6.filter(expr("(vec_id div 13) % 2 = 1"))
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val (_, pairs) = reference(dir)

    assert(VectorMaintenance.curateVecEpoch(spark, base, e0, 0L))
    val adm0 = assignedIds(base) -- base0
    assert(adm0 === expectedAdmits(pairs, base0, ids(e0)))
    assert(!VectorMaintenance.curateVecEpoch(spark, base, e0, 0L),
      "a decided epoch must replay as a ledger no-op")
    assert(assignedIds(base) -- base0 === adm0)

    assert(VectorMaintenance.curateVecEpoch(spark, base, e1, 1L))
    val adm1 = assignedIds(base) -- base0 -- adm0
    assert(adm1 === expectedAdmits(pairs, base0 ++ adm0, ids(e1)),
      "epoch 1 must gate against base ∪ admitted(0)")
    assert(IndexFence.staleness(VectorMaintenance.vecPath(base)).contains(false))
    // The ledger holds exactly the two decisions with the gate's counts.
    val ledger = spark.read.format(fmt)
      .option("path", IndexMaintenance.ledgerTable(base)).load()
      .orderBy(col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ledger === Seq(
      (0L, adm0.size.toLong, ids(e0).size - adm0.size),
      (1L, adm1.size.toLong, ids(e1).size - adm1.size)))
  }

  test("mid-stream kill + restart converges; caught-up re-run decides nothing") {
    val dir = freshDir()
    val base = Files.createTempDirectory("graft-veccur-kill").toString
    VectorMaintenance.ensureBaseAt(spark, dir, base)
    val base0 = assignedIds(base)
    val ep = graft.streaming.VectorStream.ensureGatedEpochFiles(spark, dir, base)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(ep).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ep)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        VectorMaintenance.curateVecEpoch(spark, base, b, id)
        if (seen.incrementAndGet() == 1)
          throw new RuntimeException("simulated mid-stream kill")
        ()
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    graft.streaming.VectorStream.runGatedIngest(spark, dir, base)
    val (_, pairs) = reference(dir)
    val c6 = embAll(dir).filter(col("vec_id") % 13 === 6)
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val adm0 = expectedAdmits(pairs, base0,
      ids(c6.filter(expr("(vec_id div 13) % 2 = 0"))))
    val adm1 = expectedAdmits(pairs, base0 ++ adm0,
      ids(c6.filter(expr("(vec_id div 13) % 2 = 1"))))
    assert(assignedIds(base) === base0 ++ adm0 ++ adm1)
    assert(graft.streaming.VectorStream.runGatedIngest(spark, dir, base) === 0L)
    assert(assignedIds(base) === base0 ++ adm0 ++ adm1)
  }
}
