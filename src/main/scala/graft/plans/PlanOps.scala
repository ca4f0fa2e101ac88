package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Query entries exercising graft's whole-operator custom plans. */
object PlanOps {

  type Q = (SparkSession, String) => DataFrame

  /** Top-3 lineitems per supplier by price through [[TopKPerGroup]] — the
    * custom logical node + strategy + physical operator path. One hash
    * exchange on the group key, then a single bounded-heap pass; the
    * oracle is the ROW_NUMBER formulation the operator replaces. */
  def qTopKNativePlan: Q = (s, dir) => {
    val li = Tables(s, dir).lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    TopKPerGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  val qTopKNativePlanSql: String =
    """SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber FROM (
      |  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 3
      |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin

  /** The SAME top-3-per-supplier result, but written as the portable
    * ROW_NUMBER window idiom — [[WindowTopKRewrite]] (an injected
    * optimizer rule) recognizes the dead-rank pattern and swaps in
    * [[TopKPerGroupPlan]]. The plan pin (PlanShapeSpec) asserts the
    * executed plan contains TopKPerGroup and NO Window node: users write
    * the idiom, the engine runs the bounded heap. */
  def qTopKWindowRewrite: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(s, dir).lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  val queries: Map[String, Q] = Map(
    "q_topk_native_plan"    -> qTopKNativePlan,
    "q_topk_window_rewrite" -> qTopKWindowRewrite,
  )

  val oracles: Map[String, String] = Map(
    "q_topk_native_plan"    -> qTopKNativePlanSql,
    "q_topk_window_rewrite" -> qTopKNativePlanSql,
  )
}
