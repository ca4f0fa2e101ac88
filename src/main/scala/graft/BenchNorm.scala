package graft

/** Time-local canary normalization for the bench regression gate.
  *
  * Round-12 adjudication finding: the driver's full-suite run flagged 7
  * queries at 3-9x canary-normalized — and all 7 were CONTIGUOUS in suite
  * run order (positions 9-15 of 211) while the suite's median ratio vs the
  * prior round was 1.13. Seven semantically-unrelated queries (HashMap
  * iteration order scrambles any semantic adjacency) regressing only when
  * temporally adjacent is a transient host-contention window, not a plan
  * change — and the single start-of-run canary had already completed
  * (0.239 s, "clean") before the window opened, so the run could not
  * self-identify. The fix: re-probe the canary every few queries and
  * normalize each query by the canary value IN EFFECT WHEN IT RAN.
  */
object BenchNorm {

  /** Canary value in effect at elapsed time `t`, from a timeline of
    * (elapsedSec, canarySec) probes. Returns the MAX of the two bracketing
    * probes: conservative toward forgiving the environment — a contention
    * window that inflated either neighboring probe also inflated queries
    * between them, while a genuine plan regression leaves the canary flat
    * on both sides so nothing is forgiven. Clamps to the nearest probe at
    * the ends; -1 when no valid probe exists.
    */
  def localAt(timeline: Seq[(Double, Double)], t: Double): Double = {
    val valid = timeline.filter(_._2 > 0).sortBy(_._1)
    if (valid.isEmpty) -1.0
    else {
      val before = valid.takeWhile(_._1 <= t).lastOption
      val after  = valid.dropWhile(_._1 <= t).headOption
      (before, after) match {
        case (Some(b), Some(a)) => math.max(b._2, a._2)
        case (Some(b), None)    => b._2
        case (None, Some(a))    => a._2
        case _                  => -1.0
      }
    }
  }

  /** Per-query "lc" (local canary) fields from a previous bench_full.json
    * spread. Older files (pre round-13) carry no "lc" — callers fall back
    * to that file's single global canary, which is exactly the old
    * behavior.
    */
  def parseLc(prev: String): Map[String, Double] =
    "\"([A-Za-z0-9_]+)\":\\{\"min\":[^{}]*?\"lc\":([-0-9.eE]+)".r
      .findAllMatchIn(prev)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
}
