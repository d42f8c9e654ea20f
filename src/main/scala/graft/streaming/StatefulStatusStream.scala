package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{BikePosition, StatusEvent}

/** ST2 extension — per-bike state INSIDE Spark via
  * `flatMapGroupsWithState` (SURVEY.md §2.8 notes this is an extension,
  * not parity: the reference's latest-2-files diff detects fleet-wide
  * disappearances, which per-key streaming state cannot without a full
  * sweep; in exchange, state survives micro-batch boundaries natively,
  * scales per-key, and no snapshot-wide join runs at all).
  *
  * Semantics per bike:
  *  - first sighting        → `arrived`
  *  - station change        → `departed`(old info) + `arrived`(new info)
  *  - no change             → nothing
  * Multiple observations inside one batch are applied in `_fetched_at`
  * order, exactly like consecutive snapshots.
  *
  * Scale: state is one small case class per bike, hash-partitioned by
  * bike_id across executors; a 10^6-bike fleet is trivially sharded, and
  * the state store checkpoints incrementally.
  */
object StatefulStatusStream {

  /** One observation of a bike in a snapshot. */
  case class Obs(fetchedAt: String, bike_id: String,
      station_name: Option[String], station_id: Option[String],
      lat: Option[Double], lon: Option[Double],
      bike_type: Option[String], battery: Option[Double])

  /** Persisted per-bike state: the last known position. */
  case class LastPos(fetchedAt: String, station_name: Option[String],
      station_id: Option[String], lat: Option[Double], lon: Option[Double],
      bike_type: Option[String], battery: Option[Double])

  private def toEvent(kind: String, ts: String, bikeId: String,
      sn: Option[String], sid: Option[String], lat: Option[Double],
      lon: Option[Double], bt: Option[String], bat: Option[Double]) =
    StatusEvent(ts, bikeId, kind, sn, sid, lat, lon, bt, bat)

  /** The state-transition function (public for unit tests). */
  def updateBike(bikeId: String, obsIter: Iterator[Obs],
      state: GroupState[LastPos]): Iterator[StatusEvent] = {
    val ordered = obsIter.toSeq.sortBy(_.fetchedAt)
    var last = state.getOption
    val out = Seq.newBuilder[StatusEvent]
    ordered.foreach { o =>
      last match {
        case None =>
          out += toEvent("arrived", o.fetchedAt, bikeId, o.station_name,
            o.station_id, o.lat, o.lon, o.bike_type, o.battery)
        case Some(prev) if prev.station_id != o.station_id =>
          out += toEvent("departed", o.fetchedAt, bikeId, prev.station_name,
            prev.station_id, prev.lat, prev.lon, prev.bike_type, prev.battery)
          out += toEvent("arrived", o.fetchedAt, bikeId, o.station_name,
            o.station_id, o.lat, o.lon, o.bike_type, o.battery)
        case _ => // same station: no event
      }
      last = Some(LastPos(o.fetchedAt, o.station_name, o.station_id,
        o.lat, o.lon, o.bike_type, o.battery))
    }
    last.foreach(state.update)
    out.result().iterator
  }

  /** Wire a position stream (e.g. flattened snapshots) into the stateful
    * event stream. Works on both streaming and batch Datasets. */
  def events(positions: Dataset[Obs]): Dataset[StatusEvent] = {
    val spark = positions.sparkSession
    import spark.implicits._
    positions
      .groupByKey(_.bike_id)
      .flatMapGroupsWithState[LastPos, StatusEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateBike)
  }

  /** Adapter: flattened snapshot positions DataFrame → typed Obs. */
  def obsFrom(spark: SparkSession,
      positions: org.apache.spark.sql.DataFrame): Dataset[Obs] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    positions.select(
      col("_fetched_at").as("fetchedAt"), col("bike_id"),
      col("station_name"), col("station_id"), col("lat"), col("lon"),
      col("bike_type"), col("battery")).as[Obs]
  }
}
