package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** KMV theta-sketch error-bound property test (the QuantileSketchSpec
  * treatment for `q_theta_sketch_overlap`): the oracle gate proves both
  * engines compute the SAME estimate; this spec proves the estimate is
  * WITHIN ITS PROVABLE BOUND across 100 seeded random universes of
  * varying size and overlap.
  *
  * Theory: with hashes uniform on [0, M), the KMV union estimator
  * (k−1)·M / h_k has relative standard error ≈ 1/√(k−2) (the rank bound
  * of Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations"); the intersection estimator (B/k)·Û adds the
  * binomial sampling term, rel σ ≈ √((1−p)/(k·p) + 1/(k−2)) with
  * p = |A∩B| / |A∪B|. The gate is 3σ per trial with a ≤3-of-100
  * excursion budget (a 3σ bound HOLDS ~99.7% per trial — demanding
  * 100/100 would reject the true distribution ~26% of the time) and a
  * hard 5σ ceiling. Trials are seed-fixed: deterministic, no flake.
  *
  * The estimator replayed here is bit-for-bit the one in
  * Extended.qThetaSketchOverlap: h = (x mod M)·2654435761 mod M, bottom
  * k = 64, est = 63·M / h₆₄ (m = 64 branch), exact reference = distinct
  * hash count (the estimator's true target; id-collisions pre-hash are
  * part of the modeled universe exactly as in the query).
  */
class ThetaSketchBoundSpec extends AnyFunSuite {

  private val M = 2147483647L
  private val K = 64

  private def hash(x: Long): Long = ((x % M) * 2654435761L) % M

  test("union and intersection estimates stay inside 3σ across 100 random trials") {
    var over3U, over3I = 0
    var maxSigmaU, maxSigmaI = 0.0
    for (trial <- 0 until 100) {
      val rng = new scala.util.Random(0xC0FFEE + trial * 7919)
      val nShared = 50 + rng.nextInt(2000)
      val nAOnly = 200 + rng.nextInt(4000)
      val nBOnly = 200 + rng.nextInt(4000)
      // Random 62-bit ids: the affine hash is ~uniform on them.
      def draw(n: Int): Seq[Long] =
        Seq.fill(n)(rng.nextLong() & Long.MaxValue)
      val shared = draw(nShared)
      val union = shared ++ draw(nAOnly) ++ draw(nBOnly)
      val both = shared.map(hash).toSet
      val hs = union.map(hash).distinct.sorted
      val exactU = hs.size.toDouble
      val exactI = hs.count(both.contains).toDouble
      assert(hs.size > K, "trial must exercise the m = k estimator branch")

      val sketch = hs.take(K)
      val hk = sketch.last.toDouble
      val cntBoth = sketch.count(both.contains).toDouble
      val estU = (K - 1).toDouble * M.toDouble / hk
      val estI = cntBoth / K * estU

      val sigmaU = exactU / math.sqrt((K - 2).toDouble)
      val devU = math.abs(estU - exactU) / sigmaU
      maxSigmaU = math.max(maxSigmaU, devU)
      if (devU > 3.0) over3U += 1

      val p = exactI / exactU
      if (p > 0) {
        val relI = math.sqrt((1 - p) / (K * p) + 1.0 / (K - 2))
        val devI = math.abs(estI - exactI) / (exactI * relI)
        maxSigmaI = math.max(maxSigmaI, devI)
        if (devI > 3.0) over3I += 1
      }
    }
    assert(over3U <= 3, s"union estimator exceeded 3σ in $over3U/100 trials")
    assert(over3I <= 3, s"intersection estimator exceeded 3σ in $over3I/100 trials")
    assert(maxSigmaU <= 5.0, f"union worst excursion $maxSigmaU%.2fσ breaches the 5σ ceiling")
    assert(maxSigmaI <= 5.0, f"intersection worst excursion $maxSigmaI%.2fσ breaches the 5σ ceiling")
  }

  test("the estimator is exact below the sketch cut (m < k branch)") {
    val rng = new scala.util.Random(42)
    val ids = Seq.fill(K - 10)(rng.nextLong() & Long.MaxValue)
    val hs = ids.map(hash).distinct.sorted
    assert(hs.size < K)
    // m < k: the sketch IS the set — the query's m<64 branch reports m.
    assert(hs.size.toDouble === hs.take(K).size.toDouble)
  }
}
