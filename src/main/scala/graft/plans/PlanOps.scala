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

  val queries: Map[String, Q] = Map(
    "q_topk_native_plan" -> qTopKNativePlan,
  )

  val oracles: Map[String, String] = Map(
    "q_topk_native_plan" -> qTopKNativePlanSql,
  )
}
