package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.Ride
import graft.store.{Backfill, IdempotentAppend, RidesTable}

/** K2 idempotent append + K5 backfill semantics (reference:
  * src/data_load_sqlite.py:218–235, src/backfill_distance.py;
  * tests/test_backfill_distance.py). */
class StoreSpec extends SparkSpec {

  private def ride(uid: Long, day: String, dist: Option[Double],
      coords: Option[(Double, Double, Double, Double)] = None): Ride =
    Ride(Some(uid), Some("b"), Some(Timestamp.valueOf(s"$day 10:00:00")),
      Some(Timestamp.valueOf(s"$day 10:30:00")), Some("A"), Some("B"), Some(30),
      coords.map(_._1), coords.map(_._2), coords.map(_._3), coords.map(_._4),
      dist)

  test("append is idempotent on uid across loads (INSERT OR IGNORE semantics)") {
    import spark.implicits._
    val store = tmpDir("rides") + "/bike_rides"
    val day1 = Seq(ride(1, "2024-06-08", Some(1.0)), ride(2, "2024-06-08", Some(2.0))).toDF()
    assert(RidesTable.append(spark, day1, store) === 2)

    // overlapping re-load: uid 2 repeats (also duplicated in-batch), 3 is new
    val day2 = Seq(ride(2, "2024-06-08", Some(2.0)), ride(2, "2024-06-08", Some(2.0)),
      ride(3, "2024-06-09", Some(3.0))).toDF()
    assert(RidesTable.append(spark, day2, store) === 1)

    val table = RidesTable.read(spark, store)
    assert(table.count() === 3)
    assert(table.select("uid").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // partitioned by ride_date
    assert(table.columns.contains("ride_date"))
  }

  test("newRows anti-join keeps only unseen keys") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("uid", "v")
    val incoming = Seq((2L, "b"), (3L, "c"), (3L, "c")).toDF("uid", "v")
    val delta = IdempotentAppend.newRows(incoming, existing, Seq("uid"))
    assert(delta.select("uid").as[Long].collect().toSeq === Seq(3L))
  }

  // reference tests/test_backfill_distance.py:37–77
  test("backfill fills only NULL distances with full coords, preserves others") {
    import spark.implicits._
    val rides = Seq(
      ride(1, "2024-06-08", None, Some((51.1, 17.0, 51.105, 17.01))), // → filled
      ride(2, "2024-06-08", None, None),                              // stays NULL
      ride(3, "2024-06-08", Some(9.999), Some((51.1, 17.0, 51.2, 17.1))) // preserved
    ).toDF()
    assert(Backfill.candidates(rides).select("uid").as[Long].collect().toSeq === Seq(1L))
    val out = Backfill(rides).orderBy("uid").collect()
    assert(!out(0).isNullAt(11) && math.abs(out(0).getDouble(11) - 0.891) < 0.01)
    assert(out(1).isNullAt(11))
    assert(out(2).getDouble(11) === 9.999)
  }

  test("readTyped round-trips rides through the Dataset[Ride] edge") {
    import spark.implicits._
    val store = tmpDir("typed") + "/bike_rides"
    val rides = Seq(ride(1, "2024-06-08", Some(1.5)), ride(2, "2024-06-09", None))
    RidesTable.append(spark, rides.toDF(), store)
    val back = RidesTable.readTyped(spark, store).collect().sortBy(_.uid)
    assert(back.length === 2)
    assert(back(0).distance === Some(1.5) && back(1).distance === None)
    assert(back(0).start_station === Some("A"))
  }

  test("compaction merges many small appended files, preserving rows") {
    import spark.implicits._
    val path = tmpDir("compact") + "/log"
    // simulate 20 micro-batch appends of a few rows each
    (1 to 20).foreach { i =>
      Seq((i.toLong, s"batch$i")).toDF("id", "v")
        .repartition(2).write.mode("append").parquet(path)
    }
    val before = spark.read.parquet(path).collect().map(_.getLong(0)).sorted
    val (nBefore, nAfter) = graft.store.Compaction.compact(spark, path)
    assert(nBefore >= 20 && nAfter < nBefore, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(path).collect().map(_.getLong(0)).sorted
    assert(after.toSeq === before.toSeq)
  }

  test("RangeMetrics aggregates per-day top-5 lists, not raw facts") {
    import graft.metrics.{DailyMetrics, RangeMetrics}
    import spark.implicits._
    val rides = Seq(
      ride(1, "2025-04-06", Some(1.0)), ride(2, "2025-04-06", Some(2.0)),
      ride(3, "2025-04-07", Some(3.0))
    ).toDF()
    val daily = DailyMetrics.allDays(rides).cache()

    val hist = RangeMetrics.histogramAvg(daily, "2025-04-06", "2025-04-07")
    assert(hist.count() === 24)
    // 3 rides at hour 10 over 2 days → round(3/2)=2 (Math.round HALF_UP)
    assert(hist.filter(col("hour") === 10).head().getLong(1) === 2L)

    val busiest = RangeMetrics.busiestStations(daily, "2025-04-06", "2025-04-07")
    val a = busiest.filter(col("station") === "A").head()
    assert(a.getAs[Long]("departures") === 3L && a.getAs[Long]("total") === 3L)

    val routes = RangeMetrics.topRoutes(daily, "2025-04-06", "2025-04-07")
    val r = routes.head()
    assert(r.getAs[String]("route") === "A → B" && r.getAs[Long]("rides") === 3L)

    val series = RangeMetrics.series(daily, "2025-04-06", "2025-04-07", "total_rides")
      .collect().map(r2 => (r2.getString(0), r2.getLong(1)))
    assert(series.toSeq === Seq(("2025-04-06", 2L), ("2025-04-07", 1L)))
  }
}
