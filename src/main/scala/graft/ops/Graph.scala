package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph analytics over relational facts: PageRank on the
  * supplier co-supply graph (s1 → s2 iff both supplied the same order).
  * Complements the connected-components family in [[graft.llm.Dedup]] —
  * CC is the min-label fixpoint; this is the weighted-propagation fixpoint.
  *
  * Scale notes:
  *   - Edge construction is a self-equi-join on l_orderkey — co-partitioned
  *     hash join, then distinct. At 100 TB the per-order fanout is bounded
  *     (lines per order is a constant ~4), so the pair explosion is linear
  *     in input, not quadratic.
  *   - Each PageRank iteration is: ranks ⋈ edges (equi-join on src) →
  *     groupBy(dst) sum — one shuffle of the SMALL ranks relation per
  *     iteration against a REUSED edges partitioning (Catalyst's
  *     ReuseExchange dedupes the identical edges/deg subplan exchanges
  *     across the unrolled iterations). The iteration count is fixed and
  *     small (5); for deep fixpoints, truncate lineage per generation with
  *     `localCheckpoint` exactly as Dedup.connectedComponents does.
  *   - The co-supply graph is symmetric, so every node has outdeg ≥ 1 (no
  *     dangling-mass redistribution term) and every node receives mass
  *     (no left-join backfill needed) — both asserted by construction.
  *   - Ranks are doubles; the final `round(rank, 6)` makes the hash gate
  *     robust to sub-ulp accumulation-order differences (sums of ≤ |V|
  *     terms carry ~1e-16 relative error vs a 1e-6 rounding grain).
  */
object Graph {

  type Q = (SparkSession, String) => DataFrame

  private val D = 0.85
  private val Iters = 5

  def qPageRank: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
    val supp = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val edges = supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
      .distinct()
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Fold the out-degree into the persisted edge list ONCE (w = 1/outdeg):
    // each iteration is then a single edges⋈ranks join + partial-summed
    // groupBy instead of a second per-iteration deg join. The persisted
    // weighted edges (and deg above, inside them) are the shared kernel
    // the 5 unrolled iterations reuse (same discipline as Dedup's shingle
    // relation; Verify's clearCache() releases them at end of run). The
    // oracle mirrors the same w = 1/outdeg factoring so rank*w stays
    // bit-identical across engines.
    val edgesW = edges.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .persist()
    val n = deg.agg(count(lit(1)).as("n_nodes"))

    var ranks = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"), (lit(1.0) / col("n_nodes")).as("rank"))
    for (_ <- 1 to Iters) {
      ranks = edgesW
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("w")).as("mass"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("node"),
          (lit(1 - D) / col("n_nodes") + lit(D) * col("mass")).as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy(col("node"))
  }

  val qPageRankSql: String = {
    def iterCte(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT e.dst AS node,
         |    CAST(${1 - D} AS DOUBLE) / (SELECT n_nodes FROM n)
         |      + CAST($D AS DOUBLE) * SUM(r.rank * e.w) AS rank
         |  FROM edgesw e JOIN $prev r ON e.src = r.node
         |  GROUP BY e.dst)""".stripMargin
    val iters = (1 to Iters)
      .map(i => iterCte(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |edges AS (
       |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
       |  FROM supp a JOIN supp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |edgesw AS (
       |  SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / d.outdeg AS w
       |  FROM edges e JOIN deg d ON e.src = d.src),
       |n AS (SELECT COUNT(*) AS n_nodes FROM deg),
       |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / (SELECT n_nodes FROM n) AS rank FROM deg),
       |$iters
       |SELECT node, ROUND(rank, 6) AS rank FROM r$Iters ORDER BY node""".stripMargin
  }

  /** Per-node triangle counts on the STRONG co-supply graph via
    * degree-ordered edge orientation (Cohen's MapReduce triangle
    * enumeration; same scheme as Suri & Vassilvitskii's wedge-bounded
    * variant).
    *
    * The graph: suppliers are tied iff they co-supplied ≥ 6 distinct
    * orders. Thresholding the bipartite projection is not a shortcut, it
    * is the standard densification control (co-authorship/co-purchase
    * practice): projecting supplier–order incidence creates a CLIQUE per
    * order, and the union of cliques over a uniform assignment converges
    * to the complete graph as orders grow — triangle counting on a
    * near-complete projection is Θ(n³) regardless of algorithm. The
    * strong-tie filter keeps the graph's density a property of real
    * collaboration, not of corpus size.
    *
    * Orienting every undirected edge from its (degree, id)-smaller endpoint
    * to its larger one makes each triangle appear EXACTLY once as a wedge
    * a→b, b→c closed by a→c, and — the scale point — bounds every node's
    * out-degree by O(√m), so the wedge join's fanout is Σ outdeg² ≤ O(m^1.5)
    * instead of the unoriented Σ deg² which a single celebrity node drives
    * quadratic. Three shuffles total: the wedge equi-join on the mid node,
    * the closing LEFT SEMI on (a,c) pairs, and the final per-node fold; the
    * oriented edge list is the persisted kernel all three reuse. The
    * (deg, id) total order is deterministic, so DuckDB replays it verbatim.
    */
  private[ops] val StrongTie = 6

  /** Link prediction's co-bought-parts tie threshold. Parts, not
    * suppliers, and ≥2 repeats: sparse-but-connected at every tested
    * scale — see [[qLinkPrediction]]'s graph-choice note. */
  private[ops] val LinkTie = 2

  def qTriangleCount: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
    val supp = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
    // Undirected edges are built ONCE as u < v pairs — the self-join's
    // residual halves the pair-instance volume through the heaviest
    // shuffle (the (u,v) co-occurrence count) versus emitting both
    // directions and deduping after.
    val pairs = supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= StrongTie)
      .select(col("u"), col("v"))
      .persist()
    val deg = pairs.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // Each undirected edge orients from its (degree, id)-smaller endpoint
    // — a CASE, not a filter, so every edge yields exactly one oriented
    // row and the total order makes the result an acyclic tournament
    // restriction of the co-supply graph.
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = pairs
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
      .persist()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tris = wedges
      .join(oriented,
        wedges("a") === oriented("src") && wedges("c") === oriented("dst"),
        "left_semi")
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("tri_count"))
      .orderBy(col("node"))
  }

  val qTriangleCountSql: String =
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM supp a JOIN supp b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $StrongTie),
      |deg AS (
      |  SELECT n, COUNT(*) AS deg FROM (
      |    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
      |  GROUP BY n),
      |oriented AS (
      |  SELECT
      |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND p.u < p.v)
      |         THEN p.u ELSE p.v END AS src,
      |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND p.u < p.v)
      |         THEN p.v ELSE p.u END AS dst
      |  FROM pairs p JOIN deg du ON p.u = du.n JOIN deg dv ON p.v = dv.n),
      |tris AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM oriented e1 JOIN oriented e2 ON e1.dst = e2.src
      |  WHERE EXISTS (SELECT 1 FROM oriented e3
      |                WHERE e3.src = e1.src AND e3.dst = e2.dst)),
      |nodes AS (
      |  SELECT a AS node FROM tris
      |  UNION ALL SELECT b FROM tris
      |  UNION ALL SELECT c FROM tris)
      |SELECT node, COUNT(*) AS tri_count FROM nodes GROUP BY node
      |ORDER BY node""".stripMargin

  /** Community detection by synchronous label propagation (Raghavan et
    * al.) on the strong co-supply graph — 3 deterministic iterations.
    *
    * Classic LPA breaks frequency ties randomly and updates
    * asynchronously; both are non-reproducible, so this is the
    * deterministic variant every distributed implementation actually
    * ships: synchronous updates (labels_{t+1} computed wholly from
    * labels_t) and (count DESC, label ASC) tie-break. Each iteration is
    * two shuffles — neighbor-label counting (edges ⋈ labels on src, then
    * groupBy (dst, label)) and the per-node argmax (window over dst) —
    * against the same persisted symmetric edge kernel; iteration count is
    * fixed, so the whole fixpoint unrolls into one plan, the PageRank
    * discipline. At 100 TB: label volume through each exchange is one row
    * per edge, the mode-fold is map-side combinable, and deep fixpoints
    * truncate lineage per generation with localCheckpoint exactly as
    * connectedComponents does. */
  private val LpaIters = 3

  /** The strong-tie co-supply pair graph (u < v, ≥ StrongTie shared
    * orders) — the shared trunk under [[qLabelProp]] and
    * [[qModularity]]. */
  private def strongTiePairs(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables(s, dir).lineitem
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= StrongTie)
      .select(col("u"), col("v"))
  }

  /** LpaIters rounds of mode-label propagation over the bidirected
    * edge list; returns (node, label). */
  private def lpaLabels(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val byMode = Window.partitionBy(col("dst"))
      .orderBy(col("cnt").desc, col("label"))
    for (_ <- 1 to LpaIters) {
      labels = edges
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byMode))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }

  def qLabelProp: Q = (s, dir) => {
    val pairs = strongTiePairs(s, dir)
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    lpaLabels(edges).orderBy(col("node"))
  }

  /** Newman MODULARITY of the propagated communities — the quality
    * number that tells you whether [[qLabelProp]]'s partition is
    * structure or noise (Q ≈ 0: no better than random given the degree
    * sequence; Q ≳ 0.3: real community structure), reported with the
    * community count so a degenerate all-one-label collapse is visible.
    *
    * Q = Σ_c (m_c/m − (D_c/2m)²) over communities: within-community
    * edge counts and degree sums are exact int64 folds over the SAME
    * pair/edge relations the propagation used (both endpoints' labels
    * arrive by two joins against the label table — node-grain
    * equi-joins, no new shuffle class); the ≤|communities|-term double
    * fold rides the 6-dp grain precedent. */
  def qModularity: Q = (s, dir) => {
    val pairs = strongTiePairs(s, dir).persist()
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    val lab = Lineage.cut(lpaLabels(edges))
    val m = pairs.agg(count(lit(1)).as("m"))
    val inc = pairs
      .join(lab.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(lab.select(col("node").as("v"), col("label").as("lv")), "v")
    val mc = inc.filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("m_c"))
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val dc = deg.join(lab, "node")
      .groupBy(col("label")).agg(sum(col("d")).as("d_c"))
    val dOver = col("d_c").cast("double") / (lit(2L) * col("m"))
    dc.join(mc, Seq("label"), "left_outer")
      .crossJoin(broadcast(m))
      .select(
        (coalesce(col("m_c"), lit(0L)).cast("double") / col("m") -
          dOver * dOver).as("t"))
      .agg(count(lit(1)).as("n_communities"), round(sum(col("t")), 6).as("modularity"))
      .crossJoin(broadcast(m))
      .select(col("m").as("m_edges"), col("n_communities"), col("modularity"))
  }

  /** Shared oracle CTE prefix: the strong-tie graph + LpaIters unrolled
    * propagation rounds (ending at `l$LpaIters`) — under both
    * [[qLabelPropSql]] and [[qModularitySql]]. */
  private val lpaCtesSql: String = {
    def iterCte(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT dst AS node, label FROM (
         |    SELECT e.dst, r.label, COUNT(*) AS cnt,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |                         ORDER BY COUNT(*) DESC, r.label) AS rn
         |    FROM edges e JOIN $prev r ON e.src = r.node
         |    GROUP BY e.dst, r.label)
         |  WHERE rn = 1)""".stripMargin
    val iters = (1 to LpaIters)
      .map(i => iterCte(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM supp a JOIN supp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $StrongTie),
       |edges AS (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL SELECT v, u FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |$iters"""
  }

  val qLabelPropSql: String =
    s"""${lpaCtesSql.stripMargin}
       |SELECT node, label FROM l$LpaIters ORDER BY node""".stripMargin

  /** Oracle: the label-prop CTE chain + the modularity arithmetic. */
  val qModularitySql: String =
    s"""${lpaCtesSql.stripMargin},
       |lab AS (SELECT node, label FROM l$LpaIters),
       |m AS (SELECT COUNT(*) AS m FROM pairs),
       |inc AS (SELECT la.label AS lu, lb.label AS lv
       |        FROM pairs p JOIN lab la ON p.u = la.node
       |        JOIN lab lb ON p.v = lb.node),
       |mc AS (SELECT lu AS label, COUNT(*) AS m_c FROM inc
       |       WHERE lu = lv GROUP BY 1),
       |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
       |dc AS (SELECT lab.label, CAST(SUM(d) AS BIGINT) AS d_c
       |       FROM deg JOIN lab USING (node) GROUP BY 1),
       |terms AS (SELECT
       |    CAST(COALESCE(mc.m_c, 0) AS DOUBLE) / m.m
       |      - (CAST(d_c AS DOUBLE) / (2 * m.m))
       |        * (CAST(d_c AS DOUBLE) / (2 * m.m)) AS t
       |  FROM dc LEFT JOIN mc USING (label) CROSS JOIN m)
       |SELECT (SELECT m FROM m) AS m_edges, COUNT(*) AS n_communities,
       |  ROUND(SUM(t), 6) AS modularity
       |FROM terms""".stripMargin

  /** Multi-source BFS hop distance on the strong co-supply graph: for
    * every supplier reachable within [[BfsIters]] hops of a seed set
    * (the suppliers of nation 0), the minimum hop count to any seed —
    * the frontier-expansion primitive under "blast radius" / influence
    * queries, and the min-plus sibling of the min-label fixpoint in
    * `Dedup.connectedComponents`.
    *
    * Each unrolled iteration is one equi-join of the current distance
    * relation against the persisted symmetric edge kernel plus a
    * map-side-combinable MIN fold — the relaxation d_{i+1}(v) =
    * min(d_i(v), min_{(u,v)∈E} d_i(u)+1). Distances are integers, min is
    * exact, and the seed set is a deterministic predicate, so DuckDB
    * replays the identical unrolled fixpoint. At 100 TB: the distance
    * relation through each exchange is one row per REACHED node (bounded
    * by the frontier, not the corpus); deep diameters truncate lineage
    * per generation with localCheckpoint exactly as connectedComponents
    * does. */
  private val BfsIters = 4

  def qBfsHops: Q = (s, dir) => {
    val t = Tables(s, dir)
    val supp = t.lineitem.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val pairs = supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= StrongTie)
      .select(col("u"), col("v"))
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    var dist = t.supplier.filter(col("s_nationkey") === 0)
      .select(col("s_suppkey").as("node"), lit(0L).as("dist"))
    for (_ <- 1 to BfsIters) {
      val relaxed = dist.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      // Per-generation cache: d_r feeds both the next join and the next
      // min-fold; uncached, round r re-executes rounds 1..r−1.
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    dist.orderBy(col("node"))
  }

  val qBfsHopsSql: String = {
    def iterCte(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT e.dst, d.dist + 1 FROM $prev d JOIN edges e ON d.node = e.src)
         |  GROUP BY node)""".stripMargin
    val iters = (1 to BfsIters)
      .map(i => iterCte(s"d${i - 1}", s"d$i")).mkString(",\n")
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM supp a JOIN supp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $StrongTie),
       |edges AS (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL SELECT v, u FROM pairs),
       |d0 AS (
       |  SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS dist
       |  FROM supplier WHERE s_nationkey = 0),
       |$iters
       |SELECT node, dist FROM d$BfsIters ORDER BY node""".stripMargin
  }

  /** k-core peeling (k=3) on the strong co-supply graph — the standard
    * density filter before community/robustness analysis: nodes whose
    * degree cannot support membership in a 3-core peel away, their removal
    * lowers neighbors' degrees, and the cascade repeats. This is the
    * synchronous distributed peeling round every BSP k-core implementation
    * runs; [[KcoreRounds]] rounds are unrolled (the PageRank discipline),
    * so the output is "the subgraph surviving R peels" — already the
    * 3-core when the cascade converges within R (asserted empirically in
    * MutationGraphSpec for the fixture), and a deterministic
    * over-approximation otherwise.
    *
    * Each round is one map-side-combinable degree fold plus two LEFT SEMI
    * joins of the edge list against the tiny survivor set — at 100 TB the
    * edge relation shuffles once per round on its own key, and deep
    * cascades truncate lineage per generation with localCheckpoint, the
    * connectedComponents discipline. */
  private val KcoreK = 3
  private val KcoreRounds = 3

  def qKcore: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
    val supp = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val pairs = supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= StrongTie)
      .select(col("u"), col("v"))
    var edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    for (_ <- 1 to KcoreRounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KcoreK)
        .select(col("src").as("node"))
      // Each generation persists: round r's degree fold and BOTH semi
      // joins read e_{r-1} — without the cache the unrolled lineage
      // re-executes every earlier round's joins per consumer (the
      // localCheckpoint discipline, in cache form; Verify's clearCache
      // releases them).
      edges = edges
        .join(keep, edges("src") === keep("node"), "left_semi")
        .join(keep, edges("dst") === keep("node"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_deg"))
      .orderBy(col("node"))
  }

  val qKcoreSql: String = {
    def round(prev: String, i: Int): String =
      s"""k$i AS (SELECT src AS node FROM $prev GROUP BY src HAVING COUNT(*) >= $KcoreK),
         |e$i AS (
         |  SELECT e.src, e.dst FROM $prev e
         |  WHERE EXISTS (SELECT 1 FROM k$i a WHERE a.node = e.src)
         |    AND EXISTS (SELECT 1 FROM k$i b WHERE b.node = e.dst))""".stripMargin
    val rounds = (1 to KcoreRounds).map(i => round(s"e${i - 1}", i)).mkString(",\n")
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM supp a JOIN supp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $StrongTie),
       |e0 AS (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL SELECT v, u FROM pairs),
       |$rounds
       |SELECT src AS node, COUNT(*) AS core_deg FROM e$KcoreRounds
       |GROUP BY src ORDER BY node""".stripMargin
  }

  /** Degree distribution of the strong co-supply graph in POWER-OF-TWO
    * buckets — the first thing a graph practitioner plots (heavy-tailed
    * or not decides every algorithm choice above). The bucket is
    * length(bin(degree)) = ⌊log₂ d⌋+1 computed on the INTEGER's binary
    * rendering, so no libm log enters the gate and both engines bucket
    * identically. Two map-side-combinable folds over the persisted pair
    * kernel. */
  def qDegreeHist: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
    val supp = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val pairs = supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= StrongTie)
    pairs.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      .groupBy(length(bin(col("deg"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      .orderBy(col("bucket"))
  }

  val qDegreeHistSql: String =
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM supp a JOIN supp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $StrongTie),
       |deg AS (
       |  SELECT n, COUNT(*) AS deg FROM (
       |    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
       |  GROUP BY n)
       |SELECT CAST(length(bin(deg)) AS BIGINT) AS bucket,
       |  COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg
       |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Link prediction by the RESOURCE-ALLOCATION index (Zhou–Lü–Zhang) —
    * the common-neighbor measure that downweights promiscuous hubs
    * WITHOUT libm: RA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/deg(z) (Adamic–Adar's
    * 1/log deg sibling, chosen because 1/deg is one exact IEEE division
    * both engines replay bit-for-bit). Scores only NON-adjacent pairs —
    * the candidate future edges — over the strong-tie co-supply graph,
    * top-20 by (score, pair).
    *
    * Scale shape: candidate pairs come from WEDGES (two hops through a
    * shared neighbor z, u < v orientation bounds each wedge to one row),
    * so the pair space is Σ_z C(deg(z), 2) — degree-bounded, never the
    * quadratic node cross product; existing edges drop via one LEFT ANTI
    * join; per-pair contributions fold as DECIMAL(18,9)-quantized partial
    * sums (merge-order-independent — the lmScore discipline), map-side
    * combinable; the final cut is a bounded TakeOrderedAndProject.
    *
    * Graph choice: PART co-bought pairs (repeat co-occurrence,
    * [[LinkTie]]) — the supplier co-supply graph the other operators use
    * is COMPLETE at every tested scale (few suppliers × many orders ties
    * every pair), which left link prediction with an empty candidate set
    * and its exactness machinery unverified (advice-r11); the part graph
    * is sparse at every scale, so the oracle actually exercises the RA
    * fold (MutationGraphSpec pins a full top-20 of positive scores). */
  def qLinkPrediction: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
    val supp = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = supp.as("a")
      .join(supp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= LinkTie)
      .select(col("u"), col("v"))
      .persist()
    val adj = pairs.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // Wedge generation through the shared neighbor z, oriented u < v so
    // each candidate pair appears once per common neighbor.
    val viaZ = adj.select(col("dst").as("z"), col("src").as("n"))
      .join(deg.select(col("src").as("z"), col("deg")), "z")
    val cand = viaZ.as("l")
      .join(viaZ.as("r"), col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("u"), col("r.n").as("v"),
        round(lit(1.0) / col("l.deg"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("c"))
    cand
      .join(pairs, Seq("u", "v"), "left_anti") // only NOT-yet-linked pairs
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("c")).cast("double").as("ra_score"))
      .orderBy(col("ra_score").desc, col("u"), col("v"))
      .limit(20)
  }

  val qLinkPredictionSql: String =
    s"""WITH supp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM supp a JOIN supp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $LinkTie),
       |adj AS (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL SELECT v AS src, u AS dst FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM adj GROUP BY src),
       |viaz AS (
       |  SELECT a.dst AS z, a.src AS n, d.deg
       |  FROM adj a JOIN deg d ON a.dst = d.src),
       |cand AS (
       |  SELECT l.n AS u, r.n AS v,
       |    CAST(ROUND(CAST(1.0 AS DOUBLE) / l.deg, 9) AS DECIMAL(18,9)) AS c
       |  FROM viaz l JOIN viaz r ON l.z = r.z AND l.n < r.n)
       |SELECT u, v, COUNT(*) AS n_common,
       |  CAST(SUM(c) AS DOUBLE) AS ra_score
       |FROM cand
       |WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.u = cand.u AND p.v = cand.v)
       |GROUP BY u, v
       |ORDER BY ra_score DESC, u, v LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_degree_hist" -> qDegreeHist,
    "q_pagerank" -> qPageRank,
    "q_triangle_count" -> qTriangleCount,
    "q_label_prop" -> qLabelProp,
    "q_modularity" -> qModularity,
    "q_bfs_hops" -> qBfsHops,
    "q_link_prediction" -> qLinkPrediction,
    "q_kcore" -> qKcore)
  val oracles: Map[String, String] = Map(
    "q_degree_hist" -> qDegreeHistSql,
    "q_pagerank" -> qPageRankSql,
    "q_triangle_count" -> qTriangleCountSql,
    "q_label_prop" -> qLabelPropSql,
    "q_modularity" -> qModularitySql,
    "q_bfs_hops" -> qBfsHopsSql,
    "q_link_prediction" -> qLinkPredictionSql,
    "q_kcore" -> qKcoreSql)
}
