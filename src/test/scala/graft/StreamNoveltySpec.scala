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
}
