package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch ([[FrequentItems]]).
  *
  * The property that matters at scale is the GUARANTEE, not the counts:
  * under any partitioning / merge order, every item with true frequency
  * > n/(cap+1) must survive in the sketch — that is what makes the
  * two-pass recount pattern (q_heavy_hitters) deterministic and exact.
  */
class FrequentItemsSpec extends SparkTestBase {

  import spark.implicits._

  /** Skewed stream: item i ∈ [0,9] appears 1000·(10−i) times (heavy),
    * plus 5000 singletons (light tail). n = 55000 + 5000 = 60000. */
  private lazy val skewed = {
    val heavy = (0L until 10L).flatMap(i => Seq.fill((1000 * (10 - i)).toInt)(i))
    val tail = (1000L until 6000L)
    spark.createDataset(heavy ++ tail).toDF("item")
  }

  private def sketchItems(cap: Int, parts: Int): Set[Long] =
    skewed.repartition(parts)
      .agg(call_function("graft_freq_items", col("item"), lit(cap)).as("s"))
      .select(explode(col("s")).as("c")).select($"c.item".as[Long])
      .collect().toSet

  test("guarantee: items with count > n/(cap+1) survive any partitioning") {
    val n = 60000L
    for (cap <- Seq(20, 100); parts <- Seq(1, 7, 32)) {
      val thresh = n.toDouble / (cap + 1)
      val mustSurvive = (0L until 10L).filter(i => 1000 * (10 - i) > thresh).toSet
      val got = sketchItems(cap, parts)
      assert(mustSurvive.subsetOf(got),
        s"cap=$cap parts=$parts lost ${mustSurvive -- got}")
      assert(got.size <= cap, s"cap=$cap parts=$parts emitted ${got.size} > cap entries")
    }
  }

  test("exact when distinct keys fit the capacity (no compression ever fires)") {
    val got = skewed.filter($"item" < 10)
      .agg(call_function("graft_freq_items", col("item"), lit(64)).as("s"))
      .select(explode(col("s")).as("c"))
      .select($"c.item".as[Long], $"c.lb".as[Long])
      .collect().toMap
    val exact = (0L until 10L).map(i => i -> 1000L * (10 - i)).toMap
    assert(got === exact)
  }

  test("two-pass recount equals the exact GROUP BY ... HAVING, tiny cap") {
    // cap=20 ⇒ guarantee covers count > 60000/21 ≈ 2857; threshold 3000
    // sits inside it, so recount-then-filter is exact despite the sketch
    // evicting thousands of tail keys.
    val candidates = skewed
      .agg(call_function("graft_freq_items", col("item"), lit(20)).as("s"))
      .select(explode(col("s")).as("c")).select($"c.item".as("cand"))
    val got = skewed.join(broadcast(candidates), $"item" === $"cand", "left_semi")
      .groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 3000).orderBy($"cnt".desc, $"item")
      .as[(Long, Long)].collect().toSeq
    val exact = skewed.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 3000).orderBy($"cnt".desc, $"item")
      .as[(Long, Long)].collect().toSeq
    assert(got === exact && got.nonEmpty)
  }

  test("nulls are skipped, not counted") {
    val df = Seq[java.lang.Long](1L, 1L, null, 2L).toDF("item")
    val got = df.agg(call_function("graft_freq_items", col("item"), lit(8)).as("s"))
      .select(explode(col("s")).as("c"))
      .select($"c.item".as[Long], $"c.lb".as[Long])
      .collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("property: MG guarantee holds on random zipf-ish streams × partitionings × caps") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // Random streams (zipf-ish: value v drawn with weight ~ 1/(v+1)),
    // random cap and partitioning — items with count > n/(cap+1) must
    // always survive the distributed sketch.
    val gen = for {
      n     <- Gen.choose(200, 2000)
      seed  <- Gen.choose(0L, Long.MaxValue)
      cap   <- Gen.choose(4, 40)
      parts <- Gen.choose(1, 16)
    } yield (n, seed, cap, parts)
    val prop = Prop.forAll(gen) { case (n, seed, cap, parts) =>
      val rnd = new scala.util.Random(seed)
      // inverse-CDF-ish zipf over 50 values
      val data = Seq.fill(n)(math.min(49, (50.0 / (1 + rnd.nextInt(500))).toInt * 7 + rnd.nextInt(3)).toLong)
      val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val thresh = n.toDouble / (cap + 1)
      val must = exact.collect { case (k, c) if c > thresh => k }.toSet
      val got = spark.createDataset(data).toDF("item").repartition(parts)
        .agg(call_function("graft_freq_items", col("item"), lit(cap)).as("s"))
        .select(explode(col("s")).as("c")).select($"c.item".as[Long])
        .collect().toSet
      must.subsetOf(got) && got.size <= cap
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"MG guarantee property failed: ${res.status}")
  }

  test("q_heavy_hitters plan: sketch aggregates partially map-side; recount join broadcasts") {
    val df = Udfs.qHeavyHitters(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_freq_items") || p.contains("partial_"),
      s"expected map-side partial sketch in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast candidate semi-join in:\n$p")
  }
}
