package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics + plan-shape pins for the snapshot-mutation operators
  * ([[Mutation]]) and iterative PageRank ([[Graph]]). */
class MutationGraphSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("merge upsert: matched rows take update values, unmatched both ways survive") {
    val out = Mutation.qMergeUpsert(spark, sf)
    val base = spark.read.parquet(s"$sf/orders.parquet").filter($"o_orderkey" % 3 =!= 0)
    val updKeys = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderkey" % 2 === 0).select($"o_orderkey")
    val baseN = base.count(); val updN = updKeys.count()
    val overlapN = base.join(updKeys, "o_orderkey").count()
    assert(out.count() === baseN + updN - overlapN)
    // every updated key carries the update's marker status
    val wrong = out.join(updKeys, "o_orderkey").filter($"o_orderstatus" =!= "U").count()
    assert(wrong === 0)
    // carried-over base rows are untouched
    val carried = out.join(updKeys, Seq("o_orderkey"), "left_anti")
    val expected = base.join(updKeys, Seq("o_orderkey"), "left_anti")
    assert(carried.exceptAll(expected).isEmpty && expected.exceptAll(carried).isEmpty)
  }

  test("merge upsert plan: one shuffled full-outer join, no nested loop") {
    val p = Mutation.qMergeUpsert(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected shuffled full-outer join in:\n$p")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"full-outer must not degrade to a nested loop:\n$p")
  }

  test("scd2: ranges per user are contiguous, non-overlapping, one current") {
    val out = Mutation.qScd2History(spark, sf)
      .select($"user_id", $"valid_from", $"valid_to", $"event_type", $"is_current").cache()
    // exactly one open range per user
    val open = out.groupBy($"user_id").agg(sum(when($"is_current", 1).otherwise(0)).as("n"))
    assert(open.filter($"n" =!= 1).count() === 0)
    // each closed range's valid_to equals the next range's valid_from (gapless)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"valid_from")
    val gaps = out.withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"valid_to".isNotNull && $"valid_to" =!= $"next_from").count()
    assert(gaps === 0)
    // consecutive ranges always change the tracked attribute
    val noChange = out.withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull && $"next_type" === $"event_type").count()
    assert(noChange === 0)
    out.unpersist()
  }

  test("scd2 plan: lag and lead share ONE exchange (single shuffle of events)") {
    val p = Mutation.qScd2History(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    val windows = "Window".r.findAllIn(p).length
    assert(windows >= 2, s"expected lag+lead windows in:\n$p")
    assert(exchanges === 1,
      s"expected the two windows to reuse one user_id partitioning, got $exchanges exchanges:\n$p")
  }

  test("pagerank: mass sums to ~1, ranks positive, tiny graph matches hand-rolled") {
    val out = Graph.qPageRank(spark, sf).cache()
    val total = out.agg(sum($"rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass drifted: $total")
    assert(out.filter($"rank" <= 0).count() === 0)
    // hand-rolled check on a 3-node symmetric path graph a-b-c:
    // local iteration of the same recurrence must agree with the operator's
    // formulation (computed here via the same DataFrame code path on a
    // fabricated lineitem-shaped table).
    val li = Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L))
      .toDF("l_orderkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("pr").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.qPageRank(spark, dir).as[(Long, Double)].collect().toMap
    var r = Map(10L -> 1.0 / 3, 20L -> 1.0 / 3, 30L -> 1.0 / 3)
    val deg = Map(10L -> 1, 20L -> 2, 30L -> 1)
    val in = Map(10L -> Seq(20L), 20L -> Seq(10L, 30L), 30L -> Seq(20L))
    for (_ <- 1 to 5)
      r = r.map { case (v, _) =>
        v -> (0.15 / 3 + 0.85 * in(v).map(u => r(u) / deg(u)).sum)
      }
    r.foreach { case (v, expect) =>
      assert(math.abs(got(v) - expect) < 1e-6, s"node $v: ${got(v)} vs $expect")
    }
    out.unpersist()
  }

  test("scd2 lookup: every purchase probe resolves to exactly one version") {
    val probes = graft.sources.Tables(spark, sf).events
      .filter($"event_type" === "purchase").count()
    val out = Mutation.qScd2Lookup(spark, sf).cache()
    assert(out.count() === probes, "a probe matched zero or multiple versions")
    assert(out.groupBy($"event_id").count().filter($"count" > 1).count() === 0)
    // the resolved version is always a 'purchase'-typed change row or earlier
    // change whose range covers the probe ts
    val bad = out.filter($"active_type".isNull).count()
    assert(bad === 0)
    out.unpersist()
  }

  test("profile: single-pass wide aggregate, no per-column scans") {
    val df = Profile.qProfileOrders(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected ONE scan of orders, got $scans:\n$p")
    val row = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(row("o_orderstatus") >= 1 && row("o_orderkey") >= 1)
  }

  test("triangle count: K3 plus a pendant edge yields exactly one triangle") {
    // A block of orders co-supplied by {10,20,30} → strong K3 (exactly
    // the tie threshold of shared orders per pair); a second block by
    // {30,40} → strong pendant edge 30–40; one extra order by {10,40} →
    // a WEAK tie that must be filtered out (1 shared order < threshold),
    // else a second triangle would appear. Exactly one triangle; node 40
    // is in none.
    val t = Graph.StrongTie.toLong
    val li = ((1L to t).flatMap(o => Seq((o, 10L), (o, 20L), (o, 30L))) ++
      ((t + 1) to 2 * t).flatMap(o => Seq((o, 30L), (o, 40L))) ++
      Seq((2 * t + 1, 10L), (2 * t + 1, 40L)))
      .toDF("l_orderkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.qTriangleCount(spark, dir).as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1L, 20L -> 1L, 30L -> 1L))
  }

  test("triangle count: degree orientation halves each edge exactly once") {
    // On the real graph, 3 * n_triangles must equal the per-node sum, and
    // every count must be non-negative (each triangle credits 3 nodes once).
    val out = Graph.qTriangleCount(spark, sf).cache()
    val perNode = out.agg(sum($"tri_count")).as[Long].head()
    assert(perNode % 3 === 0, s"per-node credit sum $perNode not divisible by 3")
    assert(out.filter($"tri_count" <= 0).count() === 0)
    out.unpersist()
  }

  test("label propagation: synchronous min-tiebreak fixpoint on the fixture graph") {
    // Strong graph: K3 {10,20,30} + pendant 30–40. Hand-rolled sync LPA
    // with (count DESC, label ASC): iter1 → {10:20, 20:10, 30:10, 40:30};
    // iter2 → all but 40's source already 10 → {10:10, 20:10, 30:10, 40:10};
    // iter3 is stable. Every node lands in community 10.
    val t = Graph.StrongTie.toLong
    val li = ((1L to t).flatMap(o => Seq((o, 10L), (o, 20L), (o, 30L))) ++
      ((t + 1) to 2 * t).flatMap(o => Seq((o, 30L), (o, 40L))))
      .toDF("l_orderkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("lpa").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.qLabelProp(spark, dir).as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L))
  }

  test("ewma: closed-form fold equals the sequential recurrence") {
    val events = graft.sources.Tables(spark, sf).events
      .select($"user_id", $"ts", $"event_id", $"value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
    // Sequential per-key recurrence (the definition), then the SAME
    // per-term cent quantization qsum applies to the closed form: the
    // operator's weighted-sum reformulation must reproduce it exactly.
    val expect = events.groupBy(_._1).map { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      val n = xs.length
      val contribs = xs.zipWithIndex.map { case (x, i0) =>
        val i = i0 + 1
        val w = if (i == 1) math.pow(0.5, n - 1) else math.pow(0.5, n - i + 1)
        math.floor(x * w * 100 + 0.5).toLong
      }
      u -> contribs.sum.toDouble / 100.0
    }
    val got = Analytic.qEwma(spark, sf).select($"user_id", $"ewma")
      .as[(Long, Double)].collect().toMap
    expect.foreach { case (u, e) =>
      assert(got(u) === e, s"user $u: got ${got(u)}, recurrence $e")
    }
  }

  test("ewma plan: windows and the fold share ONE user_id exchange") {
    val p = Analytic.qEwma(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1,
      s"expected row_number/count windows + groupBy to reuse one user_id partitioning, got $exchanges:\n$p")
  }

  test("pagerank plan: rank propagation joins are hash-based, not cartesian") {
    val p = Graph.qPageRank(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian in:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected hash joins in:\n$p")
  }

  test("link prediction is NON-vacuous: the candidate set is non-empty at test scale") {
    // advice-r11: a 0-row hash match verifies none of the query's
    // exactness machinery. The part co-occurrence graph must yield real
    // unlinked wedge pairs, and the RA fold must produce positive,
    // hub-downweighted scores.
    val rows = Graph.qLinkPrediction(spark, sf).collect()
    assert(rows.length === 20,
      s"the candidate set must fill the top-20 cut, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_common")) >= 1)
      assert(r.getDouble(r.fieldIndex("ra_score")) > 0.0)
    }
  }
}
