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
