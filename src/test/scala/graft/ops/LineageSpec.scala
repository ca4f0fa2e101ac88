package graft.ops

import graft.SparkTestBase
import org.apache.spark.storage.StorageLevel

/** The shared lineage-cut helper: localCheckpoint by default (one JVM —
  * executor loss is process death), a 2-replica persist under the
  * cluster switch — and identical results either way, so flipping the
  * flag on a real cluster can never change an answer. */
class LineageSpec extends SparkTestBase {

  import spark.implicits._

  private def df = spark.range(0, 1000)
    .select(($"id" % 7).as("k"), $"id".as("v"))

  test("default mode cuts lineage via local checkpoint; results exact") {
    val cut = Lineage.cut(df)
    assert(cut.groupBy($"k").count().count() === 7)
    assert(cut.queryExecution.analyzed.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
      "localCheckpoint must truncate the plan to an RDD leaf")
  }

  test("replicated mode: same rows, MEMORY_AND_DISK_2 persist, lineage intact") {
    spark.conf.set("spark.graft.lineage.replicated", "true")
    try {
      val cut = Lineage.cut(df)
      assert(cut.storageLevel === StorageLevel.MEMORY_AND_DISK_2,
        "the cluster switch must select the 2-replica persist")
      // Identical result to the default-mode cut and the raw plan.
      val want = df.collect().toSeq.sortBy(_.getLong(1))
      assert(cut.collect().toSeq.sortBy(_.getLong(1)) === want)
      // Persist does NOT truncate lineage: a lost block recomputes.
      assert(!cut.queryExecution.analyzed.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRDD")))
      cut.unpersist(blocking = true)
    } finally spark.conf.unset("spark.graft.lineage.replicated")
  }
}
