package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Property check for the bucketed interval self-join kernel: on random
  * event sets, window widths, and partitionings, the bucket construction
  * must produce EXACTLY the naive theta-join pair set — each qualifying
  * pair once (the {b, b+1} probe keys guarantee coverage, the single
  * build bucket guarantees no duplicates), no boundary off-by-ones. */
class IntervalJoinPropertySpec extends SparkTestBase {

  test("property: bucketed pairs == naive theta pairs on random inputs") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n     <- Gen.choose(20, 200)
      seed  <- Gen.choose(0L, Long.MaxValue)
      // Window from 1 µs to well above the time span, to hit the
      // all-in-one-bucket and nothing-matches extremes.
      w     <- Gen.oneOf(1L, 7L, 100L, 5000L, 100000L)
      span  <- Gen.choose(10L, 20000L)
      parts <- Gen.choose(1, 8)
    } yield (n, seed, w, span, parts)
    val prop = Prop.forAll(gen) { case (n, seed, w, span, parts) =>
      val rnd = new scala.util.Random(seed)
      // Duplicate timestamps on purpose: the id tiebreak must dedupe.
      val events = (0L until n.toLong).map(id => (id, rnd.nextLong(span)))
      val naive = (for {
        (ai, au) <- events
        (bi, bu) <- events
        if bu >= au && bu - au <= w && (au < bu || ai < bi)
      } yield (ai, bi)).toSet
      val got = Analytic.intervalSelfJoin(
          events.toDF("event_id", "us").repartition(parts), w)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      got.toSet == naive && got.length == naive.size // set-equal AND no dup rows
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"interval-join property failed: ${res.status}")
  }
}
