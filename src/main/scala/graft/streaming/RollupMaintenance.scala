package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental maintenance of a materialized rollup from a stream — the
  * freshness half of [[graft.plans.MaterializedRollupRewrite]]: the
  * rewrite answers queries from a summary table, this keeps that summary
  * current as micro-batches arrive, so together they are incremental view
  * maintenance + transparent rewrite.
  *
  * Each micro-batch folds in as partial states (counts and sums ADD —
  * the same algebra the rewrite exploits downward, applied upward), so
  * maintenance cost is O(batch) + O(summary), never a rescan of history.
  * Columns use the rewrite's `g_sum_*`/`g_cnt` naming, so a maintained
  * summary registers as a [[graft.plans.MaterializedRollupRewrite.RollupDef]]
  * verbatim.
  *
  * Exactly-once: versioned summary dirs plus ONE atomically-replaced
  * `_state` file carrying (lastBatchId, currentDir) TOGETHER. A replayed
  * batchId (engine restart after a crash anywhere in applyBatch) compares
  * against `_state` and is a no-op if already applied; a crash before the
  * `_state` swap leaves the old (id, dir) pair, so the retry re-merges
  * from the OLD summary and simply overwrites the orphaned version dir.
  * Splitting id and pointer across two files would open double-count
  * (pointer new, id old) or lost-batch (id new, pointer old) windows —
  * the single-file swap is the whole protocol. */
object RollupMaintenance {

  /** (last applied batchId, current summary dir), if any batch applied. */
  def state(root: String): Option[(Long, String)] = {
    val f = Paths.get(root, "_state")
    if (!Files.exists(f)) None
    else Files.readAllLines(f).get(0).split("\t") match {
      case Array(id, dir) => Some((id.toLong, dir))
    }
  }

  def currentDir(root: String): Option[String] = state(root).map(_._2)

  /** Fold one micro-batch into the summary. Returns false (no-op) for an
    * already-applied batchId. */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      keys: Seq[String],
      sumCols: Seq[String],
      root: String,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil): Boolean = {
    val st = state(root)
    if (st.exists(_._1 >= batchId)) return false

    // Distinct counts fold as HLL sketches: register-max union is exact
    // and order-independent, so the maintained sketch after any number of
    // micro-batches equals the sketch of the full history — the ONLY way
    // "distinct users" survives incremental maintenance (exact distinct
    // doesn't decompose into partials).
    val aggs = sumCols.map(c => sum(col(c)).as(s"g_sum_$c")) ++
      sumCols.map(c => count(col(c)).as(s"g_cntn_$c")) ++
      minCols.map(c => min(col(c)).as(s"g_min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"g_max_$c")) ++
      distinctCols.map(c => hll_sketch_agg(col(c)).as(s"g_hll_$c")) :+
      count(lit(1)).as("g_cnt")
    val partials = batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val merged = st match {
      case Some((_, dir)) =>
        // The same partial-state algebra downward: sums and counts add,
        // min-of-mins and max-of-maxes fold, sketches union.
        val reAggs = sumCols.map(c => sum(col(s"g_sum_$c")).as(s"g_sum_$c")) ++
          sumCols.map(c => sum(col(s"g_cntn_$c")).as(s"g_cntn_$c")) ++
          minCols.map(c => min(col(s"g_min_$c")).as(s"g_min_$c")) ++
          maxCols.map(c => max(col(s"g_max_$c")).as(s"g_max_$c")) ++
          distinctCols.map(c => hll_union_agg(col(s"g_hll_$c")).as(s"g_hll_$c")) :+
          sum(col("g_cnt")).as("g_cnt")
        batch.sparkSession.read.parquet(dir)
          .unionByName(partials)
          .groupBy(keys.map(col): _*)
          .agg(reAggs.head, reAggs.tail: _*)
      case None => partials
    }
    // sum over longs is LongType but nullable; the groups here are
    // non-empty by construction, so the values are never null — keep the
    // schema identical across versions for unionByName.
    val stable = merged.select(
      keys.map(col) ++ sumCols.map(c => col(s"g_sum_$c")) ++
        sumCols.map(c => coalesce(col(s"g_cntn_$c"), lit(0L)).as(s"g_cntn_$c")) ++
        minCols.map(c => col(s"g_min_$c")) ++
        maxCols.map(c => col(s"g_max_$c")) ++
        distinctCols.map(c => col(s"g_hll_$c")) :+
        coalesce(col("g_cnt"), lit(0L)).as("g_cnt"): _*)

    val newDir = s"$root/v$batchId"
    // overwrite: a crashed previous attempt of THIS batch may have left a
    // partial dir; `_state` still points at the predecessor, so replacing
    // it is safe.
    stable.write.mode("overwrite").parquet(newDir)

    val tmp = Paths.get(root, "_state.tmp")
    Files.write(tmp, s"$batchId\t$newDir".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "_state"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    // GC the superseded version (best effort — readers of the old dir
    // mid-swap finish their scan; this is local-fs test hygiene, an
    // object store would lifecycle these). Any MV registration serving
    // queries from the old dir is swung to the new one FIRST, so the
    // rewrite never chases a deleted path.
    st.foreach { case (_, old) =>
      graft.plans.MaterializedRollupRewrite.repointRollup(old, newDir)
      val p = Paths.get(old)
      if (Files.isDirectory(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    }
    true
  }

  /** Fold one micro-batch of SIGNED deltas (a z-set: rows carrying a
    * `_change_weight` of +1/−1, the weighted change feed's shape) into the
    * summary — incremental maintenance UNDER RETRACTIONS. Sums fold as
    * Σ(value·weight), counts as Σ(weight), so a delete subtracts exactly
    * what its insert added and an update (−1 old, +1 new) nets the
    * difference; groups whose maintained count reaches zero are DROPPED
    * (fully-retracted groups vanish rather than linger as zero rows).
    * MIN/MAX and HLL distinct deliberately have NO weighted form — a
    * retraction cannot un-see an extreme or remove from a sketch; asking
    * for them under retractions must fail loudly at the API, not drift
    * silently (recompute those from the base when deletes are in play).
    * Same exactly-once `_state` protocol as [[applyBatch]]; the two entry
    * points share a root interchangeably only if their column sets match
    * (the schema is checked by unionByName). */
  def applyWeightedBatch(
      batch: DataFrame,
      batchId: Long,
      keys: Seq[String],
      sumCols: Seq[String],
      root: String,
      weightCol: String = "_change_weight"): Boolean = {
    val st = state(root)
    if (st.exists(_._1 >= batchId)) return false
    val w = col(weightCol).cast("long")
    val aggs = sumCols.map(c =>
        sum(col(c) * w.cast("double")).as(s"g_sum_$c")) ++
      sumCols.map(c =>
        sum(when(col(c).isNotNull, w).otherwise(lit(0L))).as(s"g_cntn_$c")) :+
      sum(w).as("g_cnt")
    val partials = batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val merged = st match {
      case Some((_, dir)) =>
        val reAggs = sumCols.map(c => sum(col(s"g_sum_$c")).as(s"g_sum_$c")) ++
          sumCols.map(c => sum(col(s"g_cntn_$c")).as(s"g_cntn_$c")) :+
          sum(col("g_cnt")).as("g_cnt")
        batch.sparkSession.read.parquet(dir)
          .unionByName(partials)
          .groupBy(keys.map(col): _*)
          .agg(reAggs.head, reAggs.tail: _*)
      case None => partials
    }
    val stable = merged
      .filter(coalesce(col("g_cnt"), lit(0L)) > 0)
      .select(
        keys.map(col) ++ sumCols.map(c => col(s"g_sum_$c")) ++
          sumCols.map(c => coalesce(col(s"g_cntn_$c"), lit(0L)).as(s"g_cntn_$c")) :+
          coalesce(col("g_cnt"), lit(0L)).as("g_cnt"): _*)

    val newDir = s"$root/v$batchId"
    stable.write.mode("overwrite").parquet(newDir)
    val tmp = Paths.get(root, "_state.tmp")
    Files.write(tmp, s"$batchId\t$newDir".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "_state"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    st.foreach { case (_, old) =>
      graft.plans.MaterializedRollupRewrite.repointRollup(old, newDir)
      val p = Paths.get(old)
      if (Files.isDirectory(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    }
    true
  }

  /** foreachBatch sink maintaining the rollup at `root` from a WEIGHTED
    * change-feed stream (`changeFeedWeights` on the manifest source). */
  def weightedSink(
      stream: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      root: String): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (b: Dataset[Row], id: Long) =>
        applyWeightedBatch(b.toDF(), id, keys, sumCols, root); ()
    }

  /** [[weightedSink]] + continuous H2 mirror: each micro-batch maintains
    * the rollup at `root` AND lands its touched groups in H2 `table` as a
    * keyed MERGE/DELETE transaction — the upsert destination the
    * reference never had (its one sink is full-overwrite CSVREAD CTAS).
    * A retraction in the feed that nets a group to zero becomes a keyed
    * DELETE; every other touched group an upsert with its maintained
    * values. Idempotency is LAYERED: the local fold replays through the
    * `_state` fence, the H2 push through its own in-database
    * `__merge_meta` watermark ([[graft.sinks.H2Sink.mergeBatch]]) — so a
    * crash BETWEEN the two leaves the replayed batch a local no-op that
    * still completes the H2 half. Touched-group traffic is
    * O(CDC batch) — the same broadcast-sized contract the maintenance
    * fold itself imposes. */
  def weightedSinkToH2(
      stream: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      root: String,
      table: String,
      config: graft.sinks.H2Config,
      maxTouchedGroups: Int = DefaultMaxTouchedGroups): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (b: Dataset[Row], id: Long) =>
        val batch = b.toDF()
        applyWeightedBatch(batch, id, keys, sumCols, root)
        pushTouchedToH2(batch, id, keys, sumCols, root, table, config,
          maxTouchedGroups)
        ()
    }

  /** Hard cap on the per-micro-batch driver materialization in
    * [[pushTouchedToH2]]. The JDBC push is inherently driver-side (one
    * connection, batched prepared statements), so the touched-group row
    * images land on the driver — this bound turns the "CDC batches are
    * small" ASSUMPTION into a refusal CONTRACT: a batch that touches
    * more groups fails loudly instead of silently materializing an
    * unbounded collect. */
  val DefaultMaxTouchedGroups: Int = 100000

  /** The H2 half of [[weightedSinkToH2]]: join the batch's touched keys
    * against the freshly-maintained summary (a group absent there was
    * fully retracted), then hand the row images to the keyed-MERGE
    * transaction. */
  private[streaming] def pushTouchedToH2(
      batch: DataFrame,
      batchId: Long,
      keys: Seq[String],
      sumCols: Seq[String],
      root: String,
      table: String,
      config: graft.sinks.H2Config,
      maxTouchedGroups: Int = DefaultMaxTouchedGroups): Unit = {
    val dirOpt = currentDir(root)
    if (dirOpt.isEmpty) return
    val spark = batch.sparkSession
    val valCols = sumCols.map(c => s"g_sum_$c") ++
      sumCols.map(c => s"g_cntn_$c") :+ "g_cnt"
    val touched = batch.select(keys.map(col): _*).distinct()
    val cur = touched.join(spark.read.parquet(dirOpt.get), keys, "left")
    val schema = cur.schema
    // Touched groups only — CDC-batch-sized BY CONTRACT: the limit+1
    // probe refuses past the cap without ever materializing more than
    // cap+1 rows on the driver.
    val rows = cur.limit(maxTouchedGroups + 1).collect()
    if (rows.length > maxTouchedGroups) throw new IllegalStateException(
      s"micro-batch $batchId touches more than $maxTouchedGroups groups; " +
        "the keyed JDBC upsert is a driver-side push sized for CDC " +
        "batches — bulk-load the rollup instead (H2Sink overwrite, or " +
        "ManifestFileSink.mergeUpsert for the distributed merge) or " +
        "raise maxTouchedGroups deliberately")
    val cntIdx = schema.fieldIndex("g_cnt")
    val (ups, dels) = rows.partition(r => !r.isNullAt(cntIdx))
    import graft.sinks.ColType
    graft.sinks.H2Sink.mergeBatch(table, batchId, config,
      keyCols = keys.map(k => k -> ColType.fromSpark(schema(k).dataType)),
      valCols = valCols.map(c => c -> ColType.fromSpark(schema(c).dataType)),
      upserts = ups.toSeq.map(r => (keys ++ valCols).map(c => r.get(schema.fieldIndex(c)))),
      deletes = dels.toSeq.map(r => keys.map(c => r.get(schema.fieldIndex(c)))))
    ()
  }

  /** foreachBatch sink maintaining the rollup at `root`. */
  def sink(
      stream: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      root: String,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), id, keys, sumCols, root, minCols, maxCols,
          distinctCols); ()
    }
}
