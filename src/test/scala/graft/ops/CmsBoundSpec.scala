package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Count-min sketch error-bound property test: estimates are ONE-SIDED
  * (est ≥ exact always — collisions add, never subtract) and the
  * Cormode–Muthukrishnan bound P[est > exact + εN] ≤ δ holds with
  * ε = e/w, δ = e^-d over random key universes. */
class CmsBoundSpec extends SparkTestBase {

  test("est >= exact for every key; overestimate within e/w bound at e^-d rate") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    var violations = 0
    var trials = 0
    for (t <- 1 to 20) {
      // Zipf-ish universe: a few heavy keys + a long tail, the workload
      // CMS exists for.
      val rows = (1 to 50).flatMap { k =>
        val reps = if (k <= 5) 200 / k else 1 + rnd.nextInt(5)
        Seq.fill(reps)(k.toLong * 1000 + t)
      }
      val dir = java.nio.file.Files.createTempDirectory("cms").toString
      rows.map(k => (k, new java.sql.Timestamp(0L), k, "e", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Extended.qCmsHeavyHitters(spark, dir)
        .select($"k", $"exact", $"est").as[(Long, Long, Long)].collect()
      val n = rows.length.toDouble
      val eps = math.E / 256.0
      out.foreach { case (k, exact, est) =>
        assert(est >= exact, s"trial $t key $k: CMS must never undercount ($est < $exact)")
        trials += 1
        if (est > exact + eps * n) violations += 1
      }
    }
    // δ = e^-4 ≈ 1.8% expected violation rate; allow 3× slack on the
    // empirical rate before failing.
    assert(trials > 0)
    assert(violations.toDouble / trials <= 3 * math.exp(-4),
      s"overestimate beyond εN in $violations/$trials probes")
  }
}
