package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ingest.SnapshotJson
import graft.status.SnapshotDiff
import graft.streaming.StatusStream

/** Goldens from reference tests/test_bike_status_changes.py against the
  * curated snapA.json/snapB.json samples. */
class SnapshotDiffSpec extends SparkSpec {

  private val snapA = "/root/reference/data/sample/snapA.json"
  private val snapB = "/root/reference/data/sample/snapB.json"

  private lazy val posA = SnapshotJson.positions(SnapshotJson.read(spark, snapA))
  private lazy val posB = SnapshotJson.positions(SnapshotJson.read(spark, snapB))

  // reference test_snapA_freestanding_electric_station_name (:133–139)
  test("bike 590066 is freestanding in snapA") {
    val rows = posA.filter(col("bike_id") === "590066").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("station_name") === "freestanding")
    assert(rows.head.getAs[String]("station_id") === "freestanding")
    assert(rows.head.getAs[String]("bike_type") === "electric")
  }

  // reference test_diff_snapshots_detects_events_snapA_to_snapB (:22–41)
  test("snapA→snapB diff: bike 590066 departed freestanding, arrived at station") {
    val tsB = SnapshotJson.read(spark, snapB).select("_fetched_at").head().getString(0)
    assert(tsB === "2025-08-21T15:06:02+02:00")
    val events = SnapshotDiff.events(posA, posB, tsB)
    val e590066 = events.filter(col("bike_id") === "590066").collect()
    assert(e590066.length === 2)
    assert(e590066.map(_.getAs[String]("event_type")).toSet === Set("departed", "arrived"))
    val dep = e590066.find(_.getAs[String]("event_type") == "departed").get
    val arr = e590066.find(_.getAs[String]("event_type") == "arrived").get
    assert(dep.getAs[String]("station_name") === "freestanding")
    assert(arr.getAs[String]("station_name") === "Wrocław Leśnica, stacja kolejowa")
    assert(events.collect().forall(_.getAs[String]("timestamp") === tsB))
  }

  // reference test_freestanding_electric_has_generic_station_name (:97–131)
  test("minimal freestanding-electric fixture normalizes correctly") {
    val dir = tmpDir("snap")
    val payload =
      """{"_fetched_at": "2025-01-01T00:00:00",
        | "data": [{"cities": [{"places": [
        |   {"uid": "568267505", "name": "BIKE 590066",
        |    "placeType": "FREESTANDING_ELECTRIC_BIKE",
        |    "geoCoords": {"lat": 51.14448, "lng": 16.854524},
        |    "bikes": [{"number": 590066, "bikeType": "ELECTRIC_4G", "battery": 30}]}
        | ]}]}]}""".stripMargin
    Files.write(Paths.get(dir, "sample.json"), payload.getBytes(StandardCharsets.UTF_8))
    val pos = SnapshotJson.positions(SnapshotJson.read(spark, dir + "/sample.json"))
    val row = pos.collect().head
    assert(row.getAs[String]("bike_id") === "590066", "numeric bike number read as string")
    assert(row.getAs[String]("station_name") === "freestanding")
    assert(row.getAs[String]("station_id") === "freestanding")
    assert(row.getAs[String]("bike_type") === "electric")
    assert(row.getAs[Double]("battery") === 30.0)
  }

  // reference test_get_latest_files_sort_by_fetched_at (:65–73)
  test("latestFiles sorts by embedded _fetched_at, not filename") {
    val dir = tmpDir("latest")
    def mini(ts: String) =
      s"""{"_fetched_at": "$ts", "data": [{"cities": [{"places": []}]}]}"""
    Files.write(Paths.get(dir, "bike_rides_a.json"), mini("2025-01-01T00:00:01").getBytes)
    Files.write(Paths.get(dir, "bike_rides_b.json"), mini("2025-01-01T00:00:03").getBytes)
    Files.write(Paths.get(dir, "bike_rides_c.json"), mini("2025-01-01T00:00:02").getBytes)
    val latest = SnapshotJson.latestFiles(spark, dir, 2).map(f => f.split('/').last)
    assert(latest === Seq("bike_rides_c.json", "bike_rides_b.json"))
  }

  // reference test_main_works_from_arbitrary_cwd / test_save_events_to_db
  test("runOnce over a landing dir writes events parquet") {
    val dir = tmpDir("landing")
    Files.copy(Paths.get(snapA), Paths.get(dir, "bike_rides_a.json"))
    Files.copy(Paths.get(snapB), Paths.get(dir, "bike_rides_b.json"))
    val eventsPath = tmpDir("events") + "/status"
    val n = StatusStream.runOnce(spark, dir, eventsPath)
    assert(n > 0)
    val written = spark.read.parquet(eventsPath)
    assert(written.count() === n)
    assert(written.filter(col("bike_id") === "590066").count() === 2)
  }

  test("streaming processBatch applies snapshots in _fetched_at order and keeps state") {
    val eventsPath = tmpDir("events") + "/status"
    val statePath = tmpDir("state") + "/last"
    // Feed snapB and snapA in ONE batch — events must reflect A→B (the
    // _fetched_at order, not file order), and state must end at B.
    val dir = tmpDir("batch")
    Files.copy(Paths.get(snapA), Paths.get(dir, "bike_rides_a.json"))
    Files.copy(Paths.get(snapB), Paths.get(dir, "bike_rides_b.json"))
    val batch = SnapshotJson.read(spark, dir)
    val n = StatusStream.processBatch(spark, batch, eventsPath, statePath)
    assert(n > 0)
    val events = spark.read.parquet(eventsPath)
    assert(events.filter(col("bike_id") === "590066").count() === 2)
    // second batch: snapB again → zero new events (no state change)
    val n2 = StatusStream.processBatch(spark,
      SnapshotJson.read(spark, snapB), eventsPath, statePath)
    assert(n2 === 0)
  }
}
