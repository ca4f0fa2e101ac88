package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The materialized-rollup rewrite: fires only when derivable, answers
  * from the summary parquet, and is invisible to results. */
class MaterializedRollupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val base = graft.sources.Tables(spark, dir).lineitem

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // Registers the rollup on first use (same path the query entry takes).
  private lazy val rollupReady: Unit = { PlanOps.queries("q_mv_rewrite")(spark, dir); () }

  test("derivable aggregate is answered from the rollup, not the base scan") {
    rollupReady
    val q = base.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"),
        max(col("l_extendedprice")).as("mx"))
    val p = scans(q)
    assert(p.contains("graft-mv"), s"rollup scan missing from plan:\n$p")
    assert(!p.contains("lineitem.parquet"), s"base table still scanned:\n$p")
    // And the answer is identical to the base computation (spark-side
    // exact: integer-valued doubles sum exactly in any grouping order).
    val viaRollup = q.orderBy(col("l_returnflag")).collect()
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"),
          max(col("l_extendedprice")).as("mx"))
        .orderBy(col("l_returnflag")).collect()
      assert(viaRollup === direct)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) } // re-register
  }

  test("hll_sketch_agg derives from sketch partials; exact distinct never does") {
    // The sketch-rollup entry registers an orders summary keyed by
    // o_orderstatus with a g_hll_o_custkey partial.
    PlanOps.queries("q_mv_rewrite_hll")(spark, dir)
    val orders = graft.sources.Tables(spark, dir).orders
    def estQ = orders.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
    val p = scans(estQ)
    assert(p.contains("graft-mvhll"), s"sketch rollup scan missing:\n$p")
    assert(!p.contains("orders.parquet"), s"base orders still scanned:\n$p")
    // Register-max union is exact: the rewritten estimate must be
    // IDENTICAL to the direct sketch build, not merely close.
    val viaRollup = estQ.orderBy(col("o_orderstatus")).collect()
    MaterializedRollupRewrite.deregister(s"$dir/orders.parquet")
    val direct =
      try estQ.orderBy(col("o_orderstatus")).collect()
      finally { PlanOps.queries("q_mv_rewrite_hll")(spark, dir); () }
    assert(viaRollup === direct,
      "union of per-group sketches must equal the direct sketch build")
    // COUNT(DISTINCT) must NOT derive from sketches (approx ≠ exact).
    val cd = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(scans(cd).contains("orders.parquet"),
      "exact distinct must fall back to the base table")
    MaterializedRollupRewrite.deregister(s"$dir/orders.parquet")
  }

  test("filter on a rollup key commutes onto the summary table") {
    rollupReady
    val q = base.filter(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val p = scans(q)
    assert(p.contains("graft-mv") && !p.contains("lineitem.parquet"),
      s"key-only filter should not block the rewrite:\n$p")
  }

  test("non-derivable shapes fall back to the base table") {
    rollupReady
    val ungroupable = base.groupBy(col("l_suppkey")) // not a rollup key
      .agg(sum(col("l_quantity")).as("qty"))
    assert(scans(ungroupable).contains("lineitem.parquet"))

    val avgUncovered = base.groupBy(col("l_returnflag")) // no partials for l_discount
      .agg(avg(col("l_discount")).as("ad"))
    assert(scans(avgUncovered).contains("lineitem.parquet"))

    val exprSum = base.groupBy(col("l_returnflag")) // computed sum input
      .agg(sum(col("l_quantity") * 2).as("q2"))
    assert(scans(exprSum).contains("lineitem.parquet"))

    val nonKeyFilter = base.filter(col("l_quantity") > 10) // non-key filter
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    assert(scans(nonKeyFilter).contains("lineitem.parquet"))

    val distinctAgg = base.groupBy(col("l_returnflag")) // distinct never derivable
      .agg(countDistinct(col("l_suppkey")).as("nd"))
    assert(scans(distinctAgg).contains("lineitem.parquet"))
  }

  test("refresh reads the base, not its own stale registration") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mv-refresh").toString
    val basePath = s"$root/base.parquet"
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v").write.parquet(basePath)
    MaterializedRollupRewrite.create(spark, basePath, keys = Seq("k"),
      sumCols = Seq("v"), rollupPath = s"$root/r1")
    try {
      // Base grows; a refresh with the old registration still live must
      // rebuild from the BASE (the rule would otherwise answer the build
      // query from the stale summary).
      Seq(("a", 10.0)).toDF("k", "v").write.mode("append").parquet(basePath)
      MaterializedRollupRewrite.create(spark, basePath, keys = Seq("k"),
        sumCols = Seq("v"), rollupPath = s"$root/r2")
      val got = spark.read.parquet(basePath).groupBy(col("k"))
        .agg(sum(col("v")).as("sv")).orderBy(col("k"))
      assert(scans(got).contains("/r2"))
      assert(got.collect().map(r => (r.getString(0), r.getDouble(1)))
        === Array(("a", 11.0), ("b", 2.0)),
        "refreshed rollup reproduced the stale summary")
    } finally MaterializedRollupRewrite.deregister(basePath)
  }

  test("a union-of-paths scan is never answered from a single-path rollup") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mv-union").toString
    val basePath = s"$root/base.parquet"
    val otherPath = s"$root/other.parquet"
    Seq(("a", 1.0)).toDF("k", "v").write.parquet(basePath)
    Seq(("a", 100.0)).toDF("k", "v").write.parquet(otherPath)
    MaterializedRollupRewrite.create(spark, basePath, keys = Seq("k"),
      sumCols = Seq("v"), rollupPath = s"$root/r")
    try {
      val q = spark.read.parquet(basePath, otherPath).groupBy(col("k"))
        .agg(sum(col("v")).as("sv"))
      assert(!scans(q).contains("/r"), "multi-path scan must not rewrite")
      assert(q.collect().head.getDouble(1) === 101.0)
    } finally MaterializedRollupRewrite.deregister(basePath)
  }

  test("a registration whose rollup files vanished cancels, not crashes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mv-gone").toString
    val basePath = s"$root/base.parquet"
    Seq(("a", 1.0)).toDF("k", "v").write.parquet(basePath)
    MaterializedRollupRewrite.register(MaterializedRollupRewrite.RollupDef(
      basePath, s"$root/nonexistent", Seq("k"),
      Map("v" -> "g_sum_v"), Some("g_cnt"), Map.empty, Map.empty))
    try {
      val q = spark.read.parquet(basePath).groupBy(col("k"))
        .agg(sum(col("v")).as("sv"))
      assert(q.collect().head.getDouble(1) === 1.0,
        "query must fall back to the base when the rollup is unreadable")
      assert(scans(q).contains("base.parquet"))
    } finally MaterializedRollupRewrite.deregister(basePath)
  }

  test("AVG and COUNT(col) derive from the (sum, null-aware count) decomposition") {
    rollupReady
    val q = base.groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("aq"), count(col("l_quantity")).as("nq"))
      .orderBy(col("l_returnflag"))
    val p = scans(q)
    assert(p.contains("graft-mv") && !p.contains("lineitem.parquet"),
      s"avg/count(col) should now be derivable:\n$p")
    val viaRollup = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("aq"), count(col("l_quantity")).as("nq"))
        .orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(viaRollup === direct)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) }
  }

  test("lattice: two rollups of one base coexist; each query picks its derivable level") {
    rollupReady
    PlanOps.queries("q_mv_rewrite_grain")(spark, dir) // registers the daily rollup
    // Month grouping → daily rollup; flag grouping → flag/status rollup.
    val byMonth = base.groupBy(date_trunc("month", col("l_shipdate")).as("m"))
      .agg(sum(col("l_quantity")).as("qty"))
    val pm = scans(byMonth)
    assert(pm.contains("graft-mvgrain") && !pm.contains("lineitem.parquet"),
      s"month grain should come from the shipdate rollup:\n$pm")
    val byFlag = base.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val pf = scans(byFlag)
    assert(pf.contains("graft-mv-") && !pf.contains("graft-mvgrain"),
      s"flag grouping should come from the flag/status rollup:\n$pf")
    // A grouping neither covers still reads the base.
    val bySupp = base.groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("q"))
    assert(scans(bySupp).contains("lineitem.parquet"))
  }

  test("ROLLUP/CUBE over a registered rollup derive level-by-level from the summary") {
    rollupReady
    // Grouping-set plans (Aggregate over Expand) rewrite too: each set
    // groups by a subset of the rollup keys.
    val viaRollup = base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"),
        avg(col("l_quantity")).as("aq"), min(col("l_extendedprice")).as("mn"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    val p = scans(viaRollup)
    assert(p.contains("graft-mv") && !p.contains("lineitem.parquet"),
      s"grouping-set plan should answer from the summary:\n$p")
    val got = viaRollup.collect()
    val cube = base.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    assert(scans(cube).contains("graft-mv"), "cube should rewrite as well")
    val gotCube = cube.collect().length
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"),
          avg(col("l_quantity")).as("aq"), min(col("l_extendedprice")).as("mn"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
        .collect()
      assert(got === direct, "grouping-set rewrite changed results")
      assert(gotCube === base.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")).collect().length)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) }
  }

  test("a grouping-set aggregate without partials falls back to the base") {
    rollupReady
    val q = base.rollup(col("l_returnflag"))
      .agg(avg(col("l_discount")).as("ad")) // no partials for l_discount
    assert(scans(q).contains("lineitem.parquet"))
    val q2 = base.rollup(col("l_suppkey")) // not a rollup key
      .agg(sum(col("l_quantity")).as("qty"))
    assert(scans(q2).contains("lineitem.parquet"))
  }

  test("a stale registration (base changed after build) cancels the rewrite") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mv-stale").toString
    val basePath = s"$root/base.parquet"
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v").write.parquet(basePath)
    MaterializedRollupRewrite.create(spark, basePath, keys = Seq("k"),
      sumCols = Seq("v"), rollupPath = s"$root/r1")
    try {
      val q1 = spark.read.parquet(basePath).groupBy(col("k"))
        .agg(sum(col("v")).as("sv"))
      assert(scans(q1).contains("/r1"), "fresh registration should answer")
      // The base gains data behind the MV's back: the registration is now
      // stale and must go dark — correct answers beat fast wrong ones.
      Seq(("a", 10.0)).toDF("k", "v").write.mode("append").parquet(basePath)
      val q2 = spark.read.parquet(basePath).groupBy(col("k"))
        .agg(sum(col("v")).as("sv")).orderBy(col("k"))
      assert(scans(q2).contains("base.parquet"),
        "stale rollup must not answer after the base changed")
      assert(q2.collect().map(r => (r.getString(0), r.getDouble(1)))
        === Array(("a", 11.0), ("b", 2.0)))
    } finally MaterializedRollupRewrite.deregister(basePath)
  }

  test("count(*) re-aggregates partial counts exactly") {
    rollupReady
    val viaRollup = base.groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n")).orderBy(col("l_linestatus"))
    assert(scans(viaRollup).contains("graft-mv"))
    val n = viaRollup.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(n === direct)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) }
  }

  test("dsum/davg derive decimal-exactly: MV answer is bit-identical to the base answer") {
    rollupReady
    import graft.functions.Exact
    val q = base.groupBy(col("l_returnflag"))
      .agg(Exact.dsum(col("l_extendedprice")).as("rev"),
        Exact.davg(col("l_extendedprice")).as("ap"))
      .orderBy(col("l_returnflag"))
    assert(scans(q).contains("graft-mv"),
      s"dsum shape (Sum under Cast) must derive from the rollup:\n${scans(q)}")
    val viaRollup = q.collect()
    MaterializedRollupRewrite.deregister(s"$dir/lineitem.parquet")
    try {
      val direct = base.groupBy(col("l_returnflag"))
        .agg(Exact.dsum(col("l_extendedprice")).as("rev"),
          Exact.davg(col("l_extendedprice")).as("ap"))
        .orderBy(col("l_returnflag")).collect()
      // Decimal partials re-fold exactly: not approximately equal — equal.
      assert(viaRollup === direct)
    } finally { PlanOps.queries("q_mv_rewrite")(spark, dir) }
  }

  test("fingerprint resolves through Hadoop FS: file: scheme ≡ local path, length-sensitive") {
    val d = java.nio.file.Files.createTempDirectory("graft-fp")
    val f = d.resolve("part-0")
    java.nio.file.Files.writeString(f, "aaaa")
    val plain = MaterializedRollupRewrite.fingerprint(d.toString)
    assert(plain !== 0L, "existing dir must fingerprint non-zero")
    assert(MaterializedRollupRewrite.fingerprint(s"file:$d") === plain,
      "file:-scheme path must fingerprint identically to the local path")
    // Same name, same mtime tick, different length — the overwrite case a
    // names+mtimes hash misses.
    val mtime = f.toFile.lastModified()
    java.nio.file.Files.writeString(f, "aaaaaaaa")
    f.toFile.setLastModified(mtime)
    assert(MaterializedRollupRewrite.fingerprint(d.toString) !== plain,
      "a same-mtime overwrite with a new length must change the fingerprint")
    assert(MaterializedRollupRewrite.fingerprint(d.resolve("absent").toString) === 0L,
      "missing dir = no check (fence off, loudly at register time)")
  }
}
