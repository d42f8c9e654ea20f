package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical schemas + case classes for the bike-analytics data model.
  *
  * Mirrors the reference's declared DDL (reference:
  * src/data_load_sqlite.py:196–210 for `bike_rides`,
  * src/bike_status_changes.py:174–186 for `bike_status_changes`) and the
  * raw inputs (Polish CSV header, nested Nextbike snapshot JSON).
  */
object Schemas {

  /** Raw ride CSV columns, Polish header, all read as strings — type
    * coercion happens in the transform with coerce-to-null semantics
    * (reference: src/data_load_sqlite.py:162–177 `errors='coerce'`). */
  val rawRideSchema: StructType = StructType(Seq(
    StructField("UID wynajmu", StringType),
    StructField("Numer roweru", StringType),
    StructField("Data wynajmu", StringType),
    StructField("Data zwrotu", StringType),
    StructField("Stacja wynajmu", StringType),
    StructField("Stacja zwrotu", StringType),
    StructField("Czas trwania", StringType)
  ))

  /** Station dimension (reference: data/bike_stations_coords.csv; read
    * logic src/data_load_sqlite.py:115–124). lat/lon as strings at scan
    * time — embedded duplicate header rows make them non-numeric. */
  val rawStationSchema: StructType = StructType(Seq(
    StructField("station_name", StringType),
    StructField("lat", StringType),
    StructField("lon", StringType)
  ))

  /** The canonical `bike_rides` fact schema (reference:
    * src/data_load_sqlite.py:196–210; column order :181–186). */
  val rideSchema: StructType = StructType(Seq(
    StructField("uid", LongType),
    StructField("bike_number", StringType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("start_station", StringType),
    StructField("end_station", StringType),
    StructField("duration", IntegerType),
    StructField("lat_start", DoubleType),
    StructField("lon_start", DoubleType),
    StructField("lat_end", DoubleType),
    StructField("lon_end", DoubleType),
    StructField("distance", DoubleType)
  ))

  /** Nextbike snapshot document (reference: observed in
    * data/sample/snapA.json; access path src/bike_status_changes.py:41).
    * Only the navigated fields are declared — Catalyst prunes the rest of
    * the document at parse time. String-typed ids absorb both JSON
    * numbers and strings (Spark's JSON reader renders non-string atomics
    * verbatim into StringType fields, matching the reference's str()
    * coercion at src/bike_status_changes.py:57,62,77). */
  val snapshotSchema: StructType = {
    val bike = StructType(Seq(
      StructField("number", StringType),
      StructField("bikeType", StringType),
      StructField("battery", DoubleType)
    ))
    val place = StructType(Seq(
      StructField("uid", StringType),
      StructField("name", StringType),
      StructField("placeType", StringType),
      StructField("geoCoords", StructType(Seq(
        StructField("lat", DoubleType),
        StructField("lng", DoubleType)
      ))),
      StructField("bikes", ArrayType(bike)),
      StructField("bikeNumbers", ArrayType(StringType)),
      StructField("bike_numbers", ArrayType(StringType))
    ))
    val city = StructType(Seq(StructField("places", ArrayType(place))))
    val country = StructType(Seq(StructField("cities", ArrayType(city))))
    StructType(Seq(
      StructField("_fetched_at", StringType),
      StructField("data", ArrayType(country))
    ))
  }

  /** `bike_status_changes` event log (reference:
    * src/bike_status_changes.py:174–186). The autoincrement surrogate pk
    * is omitted — append-only parquet needs no row id. Timestamp kept as
    * the ISO offset STRING the reference stores (TEXT column). */
  val statusEventSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("bike_id", StringType),
    StructField("event_type", StringType),
    StructField("station_name", StringType),
    StructField("station_id", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("bike_type", StringType),
    StructField("battery", DoubleType)
  ))
}

/** One ride row (typed edge of the fact table). */
case class Ride(
    uid: Option[Long],
    bike_number: Option[String],
    start_time: Option[Timestamp],
    end_time: Option[Timestamp],
    start_station: Option[String],
    end_station: Option[String],
    duration: Option[Int],
    lat_start: Option[Double],
    lon_start: Option[Double],
    lat_end: Option[Double],
    lon_end: Option[Double],
    distance: Option[Double]
)

/** One bike-position row from a flattened snapshot. */
case class BikePosition(
    bike_id: String,
    station_name: Option[String],
    station_id: Option[String],
    lat: Option[Double],
    lon: Option[Double],
    bike_type: Option[String],
    battery: Option[Double]
)

/** One arrival/departure event. */
case class StatusEvent(
    timestamp: String,
    bike_id: String,
    event_type: String,
    station_name: Option[String],
    station_id: Option[String],
    lat: Option[Double],
    lon: Option[Double],
    bike_type: Option[String],
    battery: Option[Double]
)

/** Busiest-station entry (reference: compute_daily_metrics.py:144–153). */
case class StationStat(station: String, arrivals: Long, departures: Long, total: Long)

/** Top-route entry (reference: compute_daily_metrics.py:172–180). */
case class RouteStat(start_station: String, end_station: String, rides: Long)

/** Per-day metrics document (reference: compute_daily_metrics.py:182–194;
  * JSON shape docs/compute_daily_metrics.md:56–74). */
case class DayMetrics(
    date: String,
    total_rides: Long,
    bike_rentals_histogram: Map[String, Long],
    avg_distance_km: Double,
    avg_duration_min: Double,
    total_distance_km: Double,
    total_duration_min: Long,
    round_trips: Long,
    left_outside_station: Long,
    busiest_stations_top5: Seq[StationStat],
    top_routes_top5: Seq[RouteStat]
)
