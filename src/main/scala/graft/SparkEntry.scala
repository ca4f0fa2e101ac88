package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Analytic, Extended, Graph, Incremental, Layout, Mutation, Profile, Relational, Subqueries, TpchBreadth}
import graft.llm.{Curation, Dedup, DedupIndex, IndexMaintenance, Multimodal, ProductQuantization, Similarity, TextAnalysis, TextIndex, VectorMaintenance}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-coverage names to LogicalPlan builders over the
  * parquet tables in a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's hash-compare. Column names and
  * row order are aligned on both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytic.queries ++ Subqueries.queries ++ Extended.queries ++
      Dedup.queries ++ TextAnalysis.queries ++ Similarity.queries ++ Curation.queries ++ TextIndex.queries ++ DedupIndex.queries ++ IndexMaintenance.queries ++ VectorMaintenance.queries ++ graft.streaming.StreamingIngest.queries ++ graft.streaming.CurationStream.queries ++ graft.streaming.VectorStream.queries ++ graft.streaming.TakedownStream.queries ++
      Multimodal.queries ++ graft.functions.Udfs.queries ++ graft.plans.PlanOps.queries ++
      Layout.queries ++ Mutation.queries ++ Graph.queries ++ ProductQuantization.queries ++
      Profile.queries ++ Incremental.queries ++ TpchBreadth.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Analytic.oracles ++ Subqueries.oracles ++ Extended.oracles ++
      Dedup.oracles ++ TextAnalysis.oracles ++ Similarity.oracles ++ Curation.oracleSql ++ TextIndex.oracleSql ++ DedupIndex.oracleSql ++ IndexMaintenance.oracleSql ++ VectorMaintenance.oracleSql ++ graft.streaming.StreamingIngest.oracleSql ++ graft.streaming.CurationStream.oracleSql ++ graft.streaming.VectorStream.oracleSql ++ graft.streaming.TakedownStream.oracleSql ++
      Multimodal.oracles ++ graft.functions.Udfs.oracles ++ graft.plans.PlanOps.oracles ++
      Layout.oracles ++ Mutation.oracles ++ Graph.oracles ++ ProductQuantization.oracles ++
      Profile.oracles ++ Incremental.oracles ++ TpchBreadth.oracles
}
