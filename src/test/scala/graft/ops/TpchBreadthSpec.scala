package graft.ops

import graft.SparkTestBase

/** Plan + semantics pins for the q02/q11–q22 suite ([[TpchBreadth]]).
  *
  * Values are gated by the DuckDB oracle at sf0.01; what these tests add is
  * the scale contract — the hand-decorrelated subqueries must stay
  * equi-join/aggregate plans (no nested-loop fallbacks), dimension joins
  * must broadcast, and edge semantics (q13's join-condition filter) must
  * not drift into WHERE-clause semantics.
  */
class TpchBreadthSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q21: double-correlated EXISTS decorrelates to semi-joins, no nested loop") {
    val p = plan("q21_waiting_suppliers")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"correlated EXISTS fell back to per-row probing:\n$p")
  }

  test("q02: correlated MIN decorrelates to aggregate + equi-join, no nested loop") {
    val p = plan("q02_min_cost_supplier")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"correlated MIN fell back to per-row probing:\n$p")
  }

  test("q11/q15/q22: one-row scalar aggregates ride a broadcast, not a shuffle join") {
    for (q <- Seq("q11_important_stock", "q15_top_supplier", "q22_sales_opportunity")) {
      val p = plan(q)
      // The threshold/max/total scalar must join back via BroadcastNestedLoopJoin
      // over ONE row (that is the correct shape for a 1-row cross join) or a
      // broadcast hash join — never a SortMergeJoin of the scalar.
      assert(!p.contains("SortMergeJoin") || p.contains("BroadcastExchange"),
        s"$q: scalar compare should broadcast its one-row side:\n$p")
    }
  }

  test("q12: fact-side date filter reaches the parquet scan") {
    val p = plan("q12_late_priority")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"), s"shipdate range not pushed down:\n$pushed")
  }

  test("q19: disjunctive predicate keeps a hash join (no cross product) and prunes brands at the scan") {
    val p = plan("q19_discounted_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"OR-of-conjunctions broke the equi-join:\n$p")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("p_brand"), s"brand union not pushed to part scan:\n$pushed")
  }

  test("q13: urgent-order exclusion lives in the join condition, keeping zero-order customers") {
    import org.apache.spark.sql.functions._
    val out = TpchBreadth.q13OrderDistribution(spark, sf)
    // LEFT JOIN semantics: customers whose every order is urgent (or who have
    // no orders) must appear in the c_count = 0 bucket, not vanish.
    val zeroBucket = out.filter(col("c_count") === 0).select("custdist")
      .collect().headOption.map(_.getLong(0)).getOrElse(0L)
    val t = graft.sources.Tables(spark, sf)
    val expected = t.customer.join(
      t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(zeroBucket == expected,
      s"c_count=0 bucket $zeroBucket != customers with no non-urgent orders $expected")
  }

  test("q22: integer-cents threshold equals the dividing formulation on every row") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, sf)
    // ac*cnt > tot  ⇔  acctbal_cents > mean(positive acctbal_cents):
    // re-derive with the (non-exact at scale, fine at sf0.001) division and
    // check the row sets agree on this data.
    val pool = t.customer.select(col("c_custkey"), col("c_acctbal"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("ac"))
    val Array(tot, cnt) = pool.filter(col("c_acctbal") > 0.0)
      .agg(sum("ac"), count(lit(1))).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    val viaInts = pool.filter(col("ac") * cnt > tot).count()
    val viaDiv  = pool.filter(col("ac") > lit(tot.toDouble / cnt)).count()
    assert(viaInts == viaDiv, s"integer threshold $viaInts != division threshold $viaDiv")
  }
}
