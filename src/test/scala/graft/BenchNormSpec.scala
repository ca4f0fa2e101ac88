package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-12 adjudication fix: time-local canary normalization.
  * Scenario pinned here is the one the driver's r12 run exhibited — a
  * contention window inflating a contiguous segment of the suite while the
  * start-of-run canary reads clean.
  */
class BenchNormSpec extends AnyFunSuite {

  test("localAt takes the max of the bracketing probes") {
    // Probes at t=0 (clean 0.24), t=30 (contended 1.2), t=60 (clean 0.25).
    val tl = Seq((0.0, 0.24), (30.0, 1.2), (60.0, 0.25))
    // A query measured at t=20 sits between clean and contended probes:
    // the max (contended) forgives it.
    assert(BenchNorm.localAt(tl, 20.0) === 1.2)
    assert(BenchNorm.localAt(tl, 45.0) === 1.2)
    // Far from the window, both neighbors are clean.
    assert(BenchNorm.localAt(tl, 0.0) === 1.2) // t=0 brackets [0, 30]
    val tl2 = Seq((0.0, 0.24), (30.0, 0.26), (60.0, 1.2))
    assert(BenchNorm.localAt(tl2, 10.0) === 0.26)
  }

  test("localAt clamps at the ends and skips invalid probes") {
    val tl = Seq((5.0, 0.3), (50.0, 0.4))
    assert(BenchNorm.localAt(tl, 1.0) === 0.3)  // before first probe
    assert(BenchNorm.localAt(tl, 99.0) === 0.4) // after last probe
    assert(BenchNorm.localAt(Seq((5.0, -1.0)), 5.0) === -1.0)
    assert(BenchNorm.localAt(Seq.empty, 5.0) === -1.0)
    // A failed (-1) probe mid-timeline is ignored, not treated as a value.
    assert(BenchNorm.localAt(Seq((0.0, 0.3), (10.0, -1.0), (20.0, 0.5)), 12.0) === 0.5)
  }

  test("contention-window scenario: flat raw time normalizes below the gate") {
    // Previous round: clean run, canary 0.25, query min 0.15.
    // Current round: same query runs inside a contention window at 0.65
    // raw (4.3x!), but the local probe saw 1.1. Normalized:
    // (0.65/1.1)/(0.15/0.25) = 0.985 — the gate must NOT flag.
    val tl = Seq((0.0, 0.25), (30.0, 1.1), (60.0, 0.26))
    val lc = BenchNorm.localAt(tl, 25.0)
    val norm = (0.65 / lc) / (0.15 / 0.25)
    assert(norm < 2.0)
    // A genuine 4.3x plan regression on a clean host keeps the canary
    // flat on both sides — the gate still fires.
    val lcClean = BenchNorm.localAt(Seq((0.0, 0.25), (30.0, 0.26)), 15.0)
    val normReg = (0.65 / lcClean) / (0.15 / 0.25)
    assert(normReg > 2.0)
  }

  test("suspect trigger fires exactly where the gate would (2x over anchor, 0.3s floor)") {
    // Synthetic slow query: anchor 0.24s, measured min 0.55s (2.3x).
    assert(BenchNorm.isSuspect(0.55, 0.24))
    // Below the noise floor: a 0.1s -> 0.25s move (2.5x) never triggers.
    assert(!BenchNorm.isSuspect(0.25, 0.1))
    // Exactly 2x is in band, not a suspect (the gate uses strict >).
    assert(!BenchNorm.isSuspect(0.48, 0.24))
    // No usable anchor (new query, failed prior run): nothing to compare.
    assert(!BenchNorm.isSuspect(5.0, -1.0))
    assert(!BenchNorm.isSuspect(5.0, 0.0))
  }

  test("suspect path A — burst closed: in-band re-measure auto-clears the flag") {
    // Driver-r14 scenario: q_merge_upsert anchor 0.236, burst min 0.478
    // (raw 2.02x). The in-run re-measure lands back in band at 0.25.
    val anchorMin = 0.236
    val burstMin = 0.478
    assert(BenchNorm.isSuspect(burstMin, anchorMin))
    val eff = BenchNorm.effectiveMin(burstMin, Some(0.25))
    assert(eff === 0.25)
    // The gate's raw-ratio condition (>2.0) no longer holds: flag cleared.
    assert(eff / anchorMin <= 2.0)
  }

  test("suspect path B — real regression survives its own re-measure") {
    // A genuine plan regression: anchor 0.3, min 0.9, re-measure 0.88 —
    // still 2.9x. The flag must ship (with the evidence attached).
    val eff = BenchNorm.effectiveMin(0.9, Some(0.88))
    assert(eff === 0.88)
    assert(eff / 0.3 > 2.0)
    // A FAILED re-measure (-1) must not lower the min to garbage.
    assert(BenchNorm.effectiveMin(0.9, Some(-1.0)) === 0.9)
    assert(BenchNorm.effectiveMin(0.9, None) === 0.9)
  }

  test("suspect path C — open burst defers; the end-of-run re-measure clears the flag") {
    // Driver-r15 scenario (verdict-r15 #4): q_rfm_segments_cut flagged
    // at min 4.30 vs anchor 1.10 while its own canary probe read 0.772
    // — 3.3× the run's clean canary 0.232. The burst is OPEN by the
    // canary's testimony: an immediate re-measure recorded 3.67 s (still
    // tainted); the isolated re-run read 1.61 s. The probe must DEFER
    // the re-measure to end-of-run, where the clean sample clears the
    // raw-ratio gate.
    val runCanary = 0.232
    assert(BenchNorm.isSuspect(4.30, 1.10))
    assert(BenchNorm.deferRemeasure(0.772, runCanary),
      "a probe 3.3x the run canary means the burst is still open")
    // End-of-run: fresh probe clean, re-measure lands in band.
    assert(!BenchNorm.deferRemeasure(0.240, runCanary))
    val eff = BenchNorm.effectiveMin(4.30, Some(1.61))
    assert(eff === 1.61)
    assert(eff / 1.10 <= 2.0, "the deferred clean re-measure clears the flag")
    // A probe near the run canary does NOT defer (the r14 immediate
    // path stays the common case), and a dark canary can't attest.
    assert(!BenchNorm.deferRemeasure(0.30, runCanary))
    assert(!BenchNorm.deferRemeasure(9.0, -1.0))
  }

  test("parseMins reads per-query anchor mins from a spread") {
    val prev =
      """{"canary":0.25,"spread":{"q_a":{"min":0.15,"med":0.2,"max":0.3,"n":3,"t":12.5,"lc":0.31},""" +
        """"q_b":{"min":1.0,"med":1.1,"max":1.2,"n":3,"t":40.0,"lc":0.27}},"sf":"/x"}"""
    val mins = BenchNorm.parseMins(prev)
    assert(mins.get("q_a").contains(0.15) && mins.get("q_b").contains(1.0))
  }

  test("parseLc reads per-query lc from a spread; absent on old files") {
    val prev =
      """{"canary":0.25,"spread":{"q_a":{"min":0.15,"med":0.2,"max":0.3,"n":3,"t":12.5,"lc":0.31},""" +
        """"q_b":{"min":1.0,"med":1.1,"max":1.2,"n":3,"t":40.0,"lc":0.27}},"sf":"/x"}"""
    val lcs = BenchNorm.parseLc(prev)
    assert(lcs === Map("q_a" -> 0.31, "q_b" -> 0.27))
    // Pre-round-13 file without lc fields: empty map, caller falls back
    // to the global canary.
    val old = """{"spread":{"q_a":{"min":0.15,"med":0.2,"max":0.3,"n":3}},"sf":"/x"}"""
    assert(BenchNorm.parseLc(old).isEmpty)
  }
}
