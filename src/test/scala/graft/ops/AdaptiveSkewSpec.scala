package graft.ops

import graft.SparkTestBase

/** The declarative skew answer: AQE's runtime skew-join splitting.
  *
  * The engine demonstrates hand-salting (`q_salted_agg`/`q_salted_join`,
  * Extended.scala) for when a build side can't broadcast and AQE isn't
  * available — but the FIRST tool a user should reach for at 100× scale is
  * `spark.sql.adaptive.skewJoin.enabled`: after the shuffle-map stage runs,
  * AQE reads the real per-partition sizes, splits any partition larger than
  * max(skewedPartitionThresholdInBytes, factor × median) into chunks, and
  * replicates the matching partition of the other side — no query rewrite,
  * no salt column, correct results. This spec pins that the mechanism
  * actually engages on this build of Spark (a synthetic hot key ≫ the
  * thresholds), asserting the `skew=true` marker on the final adaptive
  * plan's sort-merge join, so a config regression (or a future Spark
  * upgrade changing defaults) fails CI rather than silently reverting the
  * engine's skew posture to salting-only. SCALE.md §skew documents when to
  * use which.
  */
class AdaptiveSkewSpec extends SparkTestBase {

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled"                                   -> "true",
      "spark.sql.adaptive.skewJoin.enabled"                          -> "true",
      // Shrink the engagement thresholds so a ~10 MB hot partition at
      // test scale looks the way a ~10 GB one does in production.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"            -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"  -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"              -> "32768",
      // Keep it a sort-merge join: broadcasting the small side would
      // dodge the skew instead of demonstrating the split.
      "spark.sql.autoBroadcastJoinThreshold"                         -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // One hot key carries 100k rows of HIGH-ENTROPY payload (~6 MB even
      // after shuffle compression — constant/padded payloads compress
      // below the threshold and columns not referenced downstream get
      // pruned before the shuffle, both of which hide the skew); the
      // other 99 keys a handful each, so the hot partition exceeds both
      // factor×median and the byte threshold. The aggregate consumes the
      // payload so column pruning can't drop it.
      val left = spark.range(0, 110000).select(
        when(col("id") < 100000, lit(0L)).otherwise(col("id") % 100).as("k"),
        concat(md5(col("id").cast("string")), md5(concat(lit("s"), col("id")))).as("payload"))
      val right = spark.range(0, 100).select(
        col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))
      val joined = left.join(right, "k")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(octet_length(col("payload"))).as("bytes"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 110000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces undersized shuffle partitions (the other adaptive half)") {
    import org.apache.spark.sql.functions._
    // Skew splitting handles partitions that are too BIG; this pins the
    // complementary behavior the 100 TB posture also relies on: a job
    // tuned for a wide stage (thousands of shuffle partitions) must not
    // drag that width through a small downstream aggregate — AQE reads
    // the real map output sizes and fuses undersized partitions, so task
    // count follows data volume instead of a static conf.
    val confs = Seq(
      "spark.sql.adaptive.enabled"                              -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled"           -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst"  -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"         -> "8m",
      "spark.sql.shuffle.partitions"                            -> "64")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = spark.range(0, 10000)
        .select((col("id") % 50).as("k"), col("id").as("v"))
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
      assert(agg.collect().length == 50)
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("coalesced"),
        s"AQE did not coalesce the 64 undersized shuffle partitions:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
