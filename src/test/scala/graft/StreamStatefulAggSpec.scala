package graft

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TTLConfig

import graft.streaming.StreamStatefulAgg
import graft.streaming.StreamStatefulAgg.{EventIn, UserStats}

/** `transformWithState` (Spark 4 arbitrary stateful streaming) over the
  * RocksDB state-store provider — the provider the operator requires.
  * Covers: state carried across micro-batches, TTL expiry of idle keys,
  * and batch-mode execution of the SAME processor matching a plain
  * groupBy aggregate.
  */
class StreamStatefulAggSpec extends SparkSpec {

  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB provider configured (captured by the
    * streaming query at start), restoring the previous provider after. */
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

  test("state carries across micro-batches (RocksDB provider)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EventIn]
      val query = StreamStatefulAgg.runningStats(input.toDS())
        .writeStream.format("memory").queryName("twstate_carry")
        .outputMode("update").start()
      try {
        // batch 1: two users
        input.addData(EventIn(1L, 100L), EventIn(1L, 50L), EventIn(2L, 10L))
        query.processAllAvailable()
        val b1 = spark.table("twstate_carry").as[UserStats].collect()
          .map(u => u.user_id -> u).toMap
        assert(b1(1L) === UserStats(1L, 2L, 150L, 100L))
        assert(b1(2L) === UserStats(2L, 1L, 10L, 10L))

        // batch 2: user 1 again — counts continue from RocksDB state;
        // user 2 untouched (update mode: no new row for it)
        input.addData(EventIn(1L, 25L))
        query.processAllAvailable()
        val all = spark.table("twstate_carry").as[UserStats].collect()
        assert(all.count(_.user_id == 1L) === 2, "one update row per batch")
        val latest1 = all.filter(_.user_id == 1L).maxBy(_.n_events)
        assert(latest1 === UserStats(1L, 3L, 175L, 100L))
        assert(all.count(_.user_id == 2L) === 1, "idle key emits nothing")
      } finally query.stop()
    }
  }

  /** Poll the memory sink until `pred` holds. Processing-time TTL keeps
    * the query running "no new data but cleaning up state" trigger
    * batches forever, so `processAllAvailable` never latches on a TTL
    * query — polling the sink is the correct wait. */
  private def awaitRows(table: String,
      pred: Array[UserStats] => Boolean): Array[UserStats] = {
    import spark.implicits._
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var rows = Array.empty[UserStats]
    while (System.nanoTime() < deadline && !pred(rows)) {
      Thread.sleep(200)
      rows = spark.table(table).as[UserStats].collect()
    }
    assert(pred(rows), s"timed out; sink rows: ${rows.mkString(", ")}")
    rows
  }

  test("TTL expires idle state; long TTL keeps it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      // short TTL: state written in batch 1 is expired by batch 2
      val shortIn = MemoryStream[EventIn]
      val shortQ = StreamStatefulAgg
        .runningStats(shortIn.toDS(), TTLConfig(Duration.ofMillis(50)))
        .writeStream.format("memory").queryName("twstate_ttl_short")
        .outputMode("update").start()
      try {
        shortIn.addData(EventIn(7L, 100L))
        awaitRows("twstate_ttl_short", _.exists(_.n_events == 1L))
        Thread.sleep(1500) // >> 50 ms TTL
        shortIn.addData(EventIn(7L, 1L))
        // second batch restarted from EMPTY state: n=1, max=1
        awaitRows("twstate_ttl_short",
          _.exists(_ === UserStats(7L, 1L, 1L, 1L)))
      } finally shortQ.stop()

      // long TTL: same timeline, state survives
      val longIn = MemoryStream[EventIn]
      val longQ = StreamStatefulAgg
        .runningStats(longIn.toDS(), TTLConfig(Duration.ofHours(1)))
        .writeStream.format("memory").queryName("twstate_ttl_long")
        .outputMode("update").start()
      try {
        longIn.addData(EventIn(7L, 100L))
        awaitRows("twstate_ttl_long", _.nonEmpty)
        Thread.sleep(1500)
        longIn.addData(EventIn(7L, 1L))
        awaitRows("twstate_ttl_long",
          _.exists(_ === UserStats(7L, 2L, 101L, 100L)))
      } finally longQ.stop()
    }
  }

  test("ListState top-k: ranking merges across batches, no-change is silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamStatefulAgg.TopEntry
    withRocksDb {
      val input = MemoryStream[EventIn]
      val query = StreamStatefulAgg.runningTopK(input.toDS(), k = 3)
        .writeStream.format("memory").queryName("twstate_topk")
        .outputMode("update").start()
      try {
        input.addData(EventIn(1L, 10L), EventIn(1L, 30L), EventIn(1L, 20L),
          EventIn(1L, 40L))
        query.processAllAvailable()
        val b1 = spark.table("twstate_topk").as[TopEntry].collect()
          .filter(_.user_id == 1L).sortBy(_.rank)
        assert(b1.map(_.value_cents).toSeq === Seq(40L, 30L, 20L))

        // batch 2: 35 displaces 20; 5 is below the bar (no effect)
        input.addData(EventIn(1L, 35L), EventIn(1L, 5L))
        query.processAllAvailable()
        val all = spark.table("twstate_topk").as[TopEntry].collect()
          .filter(_.user_id == 1L)
        assert(all.length === 6, "two emissions of 3 rows")
        val latest = all.groupBy(_.rank).map { case (r, es) =>
          r -> es.map(_.value_cents).max }
        assert(latest === Map(1 -> 40L, 2 -> 35L, 3 -> 30L))

        // batch 3: nothing beats the bar -> state unchanged, NO emission
        input.addData(EventIn(1L, 1L))
        query.processAllAvailable()
        assert(spark.table("twstate_topk").as[TopEntry].collect()
          .count(_.user_id == 1L) === 6, "silent on no-change")
      } finally query.stop()
    }
  }

  test("MapState type counts: point updates carry, only touched types emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamStatefulAgg.{TypeCount, TypedEvent}
    withRocksDb {
      val input = MemoryStream[TypedEvent]
      val query = StreamStatefulAgg.runningTypeCounts(input.toDS())
        .writeStream.format("memory").queryName("twstate_map")
        .outputMode("update").start()
      try {
        input.addData(TypedEvent(1L, "click"), TypedEvent(1L, "click"),
          TypedEvent(1L, "view"), TypedEvent(2L, "click"))
        query.processAllAvailable()
        val b1 = spark.table("twstate_map").as[TypeCount].collect()
        assert(b1.toSet === Set(TypeCount(1L, "click", 2L),
          TypeCount(1L, "view", 1L), TypeCount(2L, "click", 1L)))

        // batch 2: only user 1's "click" map entry is touched — "view"
        // and user 2 emit nothing
        input.addData(TypedEvent(1L, "click"))
        query.processAllAvailable()
        val b2 = spark.table("twstate_map").as[TypeCount].collect()
        assert(b2.length === 4, "exactly one new row")
        assert(b2.toSet.contains(TypeCount(1L, "click", 3L)))
      } finally query.stop()
    }
  }

  test("batch mode runs the same processor and matches groupBy.agg") {
    import spark.implicits._
    val events = Seq(
      EventIn(1L, 100L), EventIn(1L, 50L), EventIn(2L, 10L),
      EventIn(3L, -5L), EventIn(3L, -7L), EventIn(1L, 25L)).toDS()

    val viaState = StreamStatefulAgg.runningStats(events)
      .collect().map(u => u.user_id -> u).toMap

    val viaAgg = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value_cents").as("total_cents"),
        max($"value_cents").as("max_cents"))
      .as[UserStats].collect().map(u => u.user_id -> u).toMap

    assert(viaState === viaAgg)
    assert(viaState(3L) === UserStats(3L, 2L, -12L, -5L))
  }
}
