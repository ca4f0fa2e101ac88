package graft.ops

import graft.SparkTestBase
import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics pins for the round-10 batch: prefix-filtered exact Jaccard
  * (AllPairs completeness theorem), multi-source BFS, ACF, RRF fusion,
  * and length-striped sharding. */
class SeriesGraphFusionSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("prefix-filtered jaccard == full inverted-index jaccard (completeness)") {
    // The AllPairs theorem: restricting the self-join to (df ASC, sh ASC)
    // prefixes of length floor(n/2)+1 loses NO pair with J >= 1/2.
    val full = Dedup.dedupNgramJaccard(spark, sf).collect().toSeq
    val pref = Dedup.dedupJaccardPrefix(spark, sf).collect().toSeq
    assert(pref === full)
    assert(full.nonEmpty, "fixture should produce at least one near-dup pair")
  }

  test("bfs: seeds at distance 0, neighbors relax, all distances within bound") {
    // sf0.001's supplier table has no nation-0 rows; the next SF up does.
    val sf = "/root/testdata/sf0.01"
    val out = Graph.qBfsHops(spark, sf)
    val dists = out.as[(Long, Long)].collect().toMap
    val seeds = spark.read.parquet(s"$sf/supplier.parquet")
      .filter($"s_nationkey" === 0).select($"s_suppkey").as[Long].collect().toSet
    assert(seeds.nonEmpty)
    seeds.foreach(s => assert(dists(s) === 0L, s"seed $s must be at distance 0"))
    assert(dists.values.forall(d => d >= 0 && d <= 4))
    // non-seed reached nodes have distance >= 1
    dists.foreach { case (n, d) => if (!seeds.contains(n)) assert(d >= 1) }
  }

  test("kcore: peel converged — every survivor keeps degree >= k in the core") {
    // If after the unrolled rounds every surviving node still has degree
    // >= k within the surviving subgraph, the cascade has terminated and
    // the output IS the exact k-core (not just an over-approximation).
    val out = Graph.qKcore(spark, "/root/testdata/sf0.01")
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._2).min >= 3, "a surviving node below k means an unfinished cascade")
  }

  test("acf: bounded by [-1,1], pair counts shrink with lag, deterministic") {
    val rows = Analytic.qAcf(spark, sf)
      .select($"event_type", $"lag", $"n_pairs", $"acf")
      .as[(String, Long, Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, acf) =>
      acf.foreach(a => assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)) }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byLag = g.sortBy(_._2).map(_._3)
      assert(byLag.zip(byLag.tail).forall { case (a, b) => b <= a },
        "n_pairs must be non-increasing in lag")
    }
    val again = Analytic.qAcf(spark, sf)
      .select($"event_type", $"lag", $"n_pairs", $"acf")
      .as[(String, Long, Long, Option[Double])].collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("rrf: fused score is exactly the sum of reciprocal ranks; members from a top list") {
    val out = TextAnalysis.rrfFusion(spark, sf)
      .select($"doc_id", $"r_lex", $"r_vec", $"rrf")
      .as[(Long, Option[Int], Option[Int], Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, rl, rv, rrf) =>
      assert(rl.nonEmpty || rv.nonEmpty, s"doc $id in neither top list")
      val expect = rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rv.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6)
    }
    // a doc present in both lists outranks one present in neither list's
    // top ranks: output is sorted by fused score descending
    val scores = out.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("seasonal decomposition: additive identity, edge nulls, dow-constant seasonal") {
    val out = Analytic.qSeasonalDecompose(spark, sf).collect()
      .map(r => (r.getDate(0), r.getInt(1),
        r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.nonEmpty)
    // Trend is NULL exactly where a full contiguous 7-day frame is
    // impossible: the first three and last three days of the series.
    val defined = out.map(_._4.isDefined)
    assert(defined.take(3).forall(!_) && defined.takeRight(3).forall(!_))
    assert(defined.drop(3).dropRight(3).forall(identity),
      "contiguous fixture series: every interior day must have a trend")
    // The additive identity holds bit-for-bit where trend is defined —
    // remainder was CONSTRUCTED as revenue - trend - seasonal in one
    // IEEE chain, so == is exact, not approximate.
    out.foreach { case (_, _, rev, tr, se, rem) =>
      (tr, rem) match {
        case (Some(t), Some(r)) => assert(r == rev - t - se)
        case (None, None)       => ()
        case other              => fail(s"trend/remainder null mismatch: $other")
      }
    }
    // Seasonal is a pure function of day-of-week.
    val byDow = out.groupBy(_._2).values
    assert(byDow.forall(g => g.map(_._5).distinct.length == 1))
    assert(out.map(_._2).distinct.sorted.toSeq == (0 to 6),
      "30-day fixture covers all seven weekday indexes")
  }

  test("shard stripe: 8 shards, doc-count conservation, bounded token imbalance") {
    val out = TextAnalysis.shardStripe(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === (0L until 8L))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_._2).sum === nDocs)
    val tot = out.map(_._3)
    assert(tot.max.toDouble / tot.min <= 1.5,
      s"offset striping should bound token imbalance, got ${tot.toSeq}")
  }
}
