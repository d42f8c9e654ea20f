package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamNovelty
import graft.streaming.StreamNovelty.{KeyedRow, Novel}

/** Bloom-state streaming novelty filter: cross-batch suppression of
  * seen keys, batch-mode distinct behavior, and capacity rotation
  * (novel keys never starved). */
class StreamNoveltySpec extends SparkSpec {

  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("novelty carries across micro-batches: repeats suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[KeyedRow]
      val q = StreamNovelty.novel(input.toDS())
        .writeStream.format("memory").queryName("novelty")
        .outputMode("update")
        .option("checkpointLocation", tmpDir("novelty-ckpt"))
        .start()
      try {
        input.addData(KeyedRow("a", 1L), KeyedRow("b", 2L), KeyedRow("a", 3L))
        q.processAllAvailable()
        val b1 = spark.table("novelty").as[Novel].collect().map(_.key).toSet
        assert(b1 === Set("a", "b"), s"batch 1 emitted $b1")
        input.addData(KeyedRow("b", 4L), KeyedRow("c", 5L))
        q.processAllAvailable()
        val all = spark.table("novelty").as[Novel].collect().map(_.key)
        assert(all.sorted.toSeq === Seq("a", "b", "c"),
          s"repeat 'b' must be suppressed in batch 2: ${all.toSeq}")
      } finally q.stop()
    }
  }

  test("batch mode: one emission per distinct key (no FP at this sizing)") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => KeyedRow(s"k${i % 50}", i)).toDS()
    val out = StreamNovelty.novel(rows).collect()
    assert(out.map(_.key).toSet === (0 until 50).map(i => s"k$i").toSet)
    assert(out.length === 50, "exactly one emission per distinct key")
  }

  test("rotation: novel keys are admitted past capacity, never starved") {
    import spark.implicits._
    val rows = (0L until 20L).map(i => KeyedRow(s"n$i", i)).toDS()
    // one bucket, capacity 4 → rotates repeatedly; every distinct key
    // must still be emitted exactly once within the single pass
    val out = StreamNovelty.novel(rows, buckets = 1, capacity = 4L).collect()
    assert(out.map(_.key).toSet === (0 until 20).map(i => s"n$i").toSet)
  }

  test("state bridge round trip: stream-built words == batch-built; " +
      "merged epoch folds into the corpus probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("novelty-export-ckpt")
    val streamKeys = (0 until 40).map(i => s"s$i")
    withRocksDb {
      val input = MemoryStream[KeyedRow]
      val q = StreamNovelty.novel(input.toDS())
        .writeStream.format("memory").queryName("novelty_export")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        input.addData(streamKeys.take(25).zipWithIndex
          .map { case (k, i) => KeyedRow(k, i.toLong) }: _*)
        q.processAllAvailable()
        input.addData(streamKeys.drop(25).zipWithIndex
          .map { case (k, i) => KeyedRow(k, 100L + i) }: _*)
        q.processAllAvailable()
      } finally q.stop()
    }
    // export the committed state; rebuild the same words in batch —
    // bit-OR is order-free and nothing rotated, so the frames are
    // IDENTICAL, row for row
    val exported = StreamNovelty.exportState(spark, ckpt)
    val batch = StreamNovelty.batchWords(
      streamKeys.toDF("key"), "key")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "word_idx", "word")
        .as[(Int, Int, Long)].collect().toSet
    assert(rows(exported) === rows(batch))
    assert(rows(exported).nonEmpty)
    // fold the exported epoch into a batch corpus sketch built over a
    // different key set; the packed global filter must admit BOTH key
    // families and reject fresh keys (no false negatives; FP-free at
    // this sizing)
    val corpusKeys = (0 until 30).map(i => s"c$i")
    val merged = StreamNovelty.mergeWords(Seq(
      exported, StreamNovelty.batchWords(corpusKeys.toDF("key"), "key")))
    val packed = org.apache.spark.sql.functions.broadcast(
      StreamNovelty.packedGlobal(merged, 1 << 16, 64))
    val probe = (streamKeys ++ corpusKeys ++ (0 until 30).map(i => s"f$i"))
      .toDF("key").crossJoin(packed)
      .select($"key", StreamNovelty.mightContainPositions(
        StreamNovelty.keyPositions($"key", 1 << 16, 5, 64),
        $"bloom").as("hit"))
      .as[(String, Boolean)].collect().toMap
    (streamKeys ++ corpusKeys).foreach(k =>
      assert(probe(k), s"member $k must probe true (no false negatives)"))
    (0 until 30).foreach(i =>
      assert(!probe(s"f$i"), s"fresh key f$i probed true"))
  }
}
