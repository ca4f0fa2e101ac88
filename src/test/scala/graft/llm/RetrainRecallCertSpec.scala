package graft.llm

import graft.SparkTestBase

/** Pins the DOMINANCE/PARITY claim of the retrain-recall certificate
  * (verdict-r18 Next #4): the incremental retrain's mini-batch trade —
  * centroids advance to exact grown-corpus means while stored
  * assignments lag one update — was asserted sound but never measured.
  * `vec_retrain_recall_cert` measures it: after two full
  * append/delete/retrainIncremental cycles, recall@5 of the served
  * incremental index vs brute-force ground truth, next to a full
  * from-scratch retrain on the same probes. This spec pins the claim:
  * the incremental index's recall is AT PARITY with the from-scratch
  * retrain (within one neighbor on the probe average) — if a future
  * change to the fold or the lag semantics drops incremental recall
  * materially below the full-retrain reference, this fails. */
class RetrainRecallCertSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("incremental retrain serves at parity with a full from-scratch retrain") {
    val rows = VectorMaintenance.vecRetrainRecallCert(spark, dir).collect()
    // One row per surviving probe: vec_id < 20, none deleted by the
    // certificate's windows ([100,110) and [195,221)).
    assert(rows.length === 20, s"expected 20 probes, got ${rows.length}")
    assert(rows.map(_.getLong(0)).toSeq === (0L until 20L),
      "probe ids must be exactly the surviving vec_id < 20")
    rows.foreach { r =>
      assert(r.getLong(1) === 5L, s"probe ${r.getLong(0)}: n_truth must be 5")
      assert(r.getDouble(3) === r.getLong(2).toDouble / 5)
      assert(r.getDouble(5) === r.getLong(4).toDouble / 5)
    }
    val avgInc = rows.map(_.getDouble(3)).sum / rows.length
    val avgFull = rows.map(_.getDouble(5)).sum / rows.length
    info(f"recall@5: incremental $avgInc%.3f vs full retrain $avgFull%.3f")
    // The parity claim: the lag costs less than one neighbor in five on
    // the probe average (0.2 = 1/k). Both directions are legal — a
    // fresh training can also REORGANIZE cells and lose a probe's
    // neighborhood — so the pin is |difference|, not one-sided.
    assert(math.abs(avgInc - avgFull) <= 0.2,
      f"mini-batch lag cost ${avgFull - avgInc}%.3f recall@5 — the " +
        "documented trade is at most one neighbor in five on average")
    // And the index is not degenerate: at sf0.001 a nprobe=1 search
    // probes one ~25-member cell out of ~500 vectors (5% of the corpus),
    // so chance recall is ~0.05 — measured 0.26 incremental vs 0.25
    // full retrain (the absolute level is the nprobe=1 trade both
    // serves share; PARITY is the certificate's claim). Floor well
    // above chance, below the measured level's noise band.
    assert(avgInc >= 0.15, f"incremental recall@5 $avgInc%.3f degenerate")
  }
}
