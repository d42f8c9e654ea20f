package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming model-quality monitor: maintain a RUNNING confusion-count
  * state over a stream of scored predictions, so every agreement
  * metric in [[graft.ext.Eval]] is readable at any moment without
  * rescanning history.
  *
  * Why counts: the confusion matrix is the sufficient statistic for
  * kappa / weighted kappa / MCC / P/R/F1, it is ≤ |classes|² rows no
  * matter how many predictions have streamed past, and it merges by
  * ADDITION — the same semilattice-merge property the sketch shelf
  * (KMV, Bloom, quantile) builds on. Each micro-batch folds to its own
  * tiny count delta and merges into the state parquet.
  *
  * Idempotent replay: foreachBatch can re-deliver a batch after a
  * restart; the state carries the highest merged `batch_id` and a
  * replayed batch (id ≤ stored max) is a no-op — the K2
  * idempotent-append discipline applied to counts. State swap goes
  * through write-tmp-then-rename (the K6 backup-before-mutate
  * pattern shared with [[StatusStream]]).
  */
object StreamEval {

  /** Start the monitor over a streaming frame of (label, pred) rows. */
  def start(preds: DataFrame, labelCol: String, predCol: String,
      statePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    val spark = preds.sparkSession
    preds.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(spark, batch, labelCol, predCol, statePath, id)
        ()
      }
      .start()
  }

  /** One micro-batch: fold to (label, pred, n) and add into the state.
    * Returns the number of rows merged (0 on an idempotent replay or
    * an empty batch — merging nothing is a no-op, so empty batches
    * never write a state generation whose `max(batch_id)` would be
    * NULL over zero rows). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, labelCol: String,
      predCol: String, statePath: String, batchId: Long): Long = {
    val prev: Option[DataFrame] = readState(spark, statePath)
    // null-safe: a state written by an older build could be empty
    val maxSeen = prev.flatMap(p =>
        Option(p.agg(max(col("batch_id"))).head().get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(-1L)
    if (batchId <= maxSeen) return 0L
    val nRows = batch.count()
    if (nRows == 0L) return 0L
    val delta = batch.select(col(labelCol).cast("int").as("label"),
        col(predCol).cast("int").as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val merged = prev.map(_.select(col("label"), col("pred"), col("n")))
      .map(_.unionByName(delta)).getOrElse(delta)
      .groupBy(col("label"), col("pred"))
      .agg(sum(col("n")).as("n"))
      .withColumn("batch_id", lit(batchId))
    val tmp = statePath + "_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    replace(spark, tmp, statePath)
    nRows
  }

  /** Current confusion counts (label, pred, n), ready for the
    * counts-based folds in [[graft.ext.Eval]]. */
  def counts(spark: SparkSession, statePath: String): DataFrame =
    readState(spark, statePath)
      .getOrElse(throw new IllegalStateException(
        s"no monitor state at $statePath (and no backup generation)"))
      .select(col("label"), col("pred"), col("n"))
      .orderBy(col("label"), col("pred"))

  /** Read the live state, falling back to the `_bak` generation left
    * by a swap that crashed between its two renames. */
  private def readState(spark: SparkSession,
      statePath: String): Option[DataFrame] =
    if (exists(spark, statePath)) Some(spark.read.parquet(statePath))
    else if (exists(spark, statePath + "_bak"))
      Some(spark.read.parquet(statePath + "_bak"))
    else None

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Crash-safe swap: the previous generation is RENAMED ASIDE (not
    * deleted) before the new one takes its place, so a crash between
    * the two renames leaves the `_bak` generation for [[readState]] —
    * delete-then-rename would silently drop ALL accumulated counts
    * AND reset the replay guard if the process died in the gap. */
  private def replace(spark: SparkSession, from: String, to: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(from)
    val dst = new org.apache.hadoop.fs.Path(to)
    val bak = new org.apache.hadoop.fs.Path(to + "_bak")
    val fs = src.getFileSystem(conf)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(src, dst)
    if (fs.exists(bak)) fs.delete(bak, true)
  }
}
