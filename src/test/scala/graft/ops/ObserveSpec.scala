package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** `Dataset.observe` operability surface: quality counters computed inside
  * the job's own pass (no second scan), for batch actions and for every
  * streaming micro-batch. */
class ObserveSpec extends SparkTestBase {

  test("batch: load metrics ride the action and match the data") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), 20.0), (None, 5.0), (Some(4L), 15.0)
    ).toDF("k", "v")
    val observed = Observe.withLoadMetrics(df, "load_q", "k", "v")
    // The action must execute THIS Dataset's plan: collect() runs
    // observed.queryExecution, while count() would plan a separate
    // aggregate query whose metrics land on that other execution.
    assert(observed.collect().length == 4)
    val m = observed.queryExecution.observedMetrics("load_q")
    assert(m.getAs[Long]("n_rows") == 4L)
    assert(m.getAs[Long]("null_keys") == 1L)
    assert(m.getAs[Double]("total_value") == 50.0)
  }

  test("batch: observation does not change the plan's data or add a scan") {
    import spark.implicits._
    val df = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val observed = Observe.withLoadMetrics(df.toDF(), "noop_q", "k", "v")
    assert(observed.collect().map(_.getLong(1)).sum == df.collect().map(_.getLong(1)).sum)
    // CollectMetrics is a pass-through node: exactly one scan in the plan.
    val p = observed.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Range")) == 1, s"extra scan:\n$p")
  }

  test("in-flight DQ: spec-driven expectations surface violations on a real write") {
    import spark.implicits._
    // The same Dq.Check specs that compile to the post-hoc suite compile
    // to observe() accumulators riding the write's own pass — the
    // violation is visible the moment the write finishes, no second scan.
    val df = Seq((Some(1L), 10.0), (None, -5.0), (Some(1L), 20.0)).toDF("k", "v")
    val checks = Seq(
      Dq.NotNull("t", "k"),
      Dq.Satisfies("t", "v positive", col("v") > 0),
      Dq.Unique("t", "k"))
    val observed = Dq.observed(df.toDF(), "dq_gate", checks)

    val captured = new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get("dq_gate").foreach(captured.set)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-dq-obs").toString
      observed.write.mode("overwrite").parquet(s"$out/gated.parquet")
      // The execution listener fires asynchronously.
      val deadline = System.nanoTime() + 10_000_000_000L
      while (captured.get() == null && System.nanoTime() < deadline) Thread.sleep(50)
      val m = captured.get()
      assert(m != null, "write finished but no observed metrics arrived")
      assert(m.getAs[Long]("t.k not_null") === 1L)
      assert(m.getAs[Long]("t.v positive") === 1L)
      // Unique rides in-flight as an HLL estimate — exact at this scale.
      assert(m.getAs[Long]("t.k unique") === 2L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming: observed metrics surface per micro-batch in the progress") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val observed = Observe.withLoadMetrics(
      in.toDF().toDF("k", "v"), "stream_q", "k", "v")
    val q = observed.writeStream.format("memory").queryName("obs_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    in.addData((1L, 2.5), (2L, 7.5))
    q.processAllAvailable()
    val metrics = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("stream_q"))).lastOption
    q.stop()
    assert(metrics.isDefined, "no observed metrics in any progress")
    assert(metrics.get.getAs[Long]("n_rows") == 2L)
    assert(metrics.get.getAs[Double]("total_value") == 10.0)
  }
}
