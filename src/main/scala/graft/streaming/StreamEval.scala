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
    * Returns the number of rows merged (0 on an idempotent replay). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, labelCol: String,
      predCol: String, statePath: String, batchId: Long): Long = {
    val prev: Option[DataFrame] =
      if (exists(spark, statePath)) Some(spark.read.parquet(statePath))
      else None
    val maxSeen = prev.map(_.agg(max(col("batch_id"))).head().getLong(0))
      .getOrElse(-1L)
    if (batchId <= maxSeen) return 0L
    val delta = batch.select(col(labelCol).cast("int").as("label"),
        col(predCol).cast("int").as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val merged = prev.map(_.select(col("label"), col("pred"), col("n")))
      .map(_.unionByName(delta)).getOrElse(delta)
      .groupBy(col("label"), col("pred"))
      .agg(sum(col("n")).as("n"))
      .withColumn("batch_id", lit(batchId))
    val nRows = batch.count()
    val tmp = statePath + "_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    replace(spark, tmp, statePath)
    nRows
  }

  /** Current confusion counts (label, pred, n), ready for the
    * counts-based folds in [[graft.ext.Eval]]. */
  def counts(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .select(col("label"), col("pred"), col("n"))
      .orderBy(col("label"), col("pred"))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def replace(spark: SparkSession, from: String, to: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(from)
    val dst = new org.apache.hadoop.fs.Path(to)
    val fs = src.getFileSystem(conf)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(src, dst)
  }
}
