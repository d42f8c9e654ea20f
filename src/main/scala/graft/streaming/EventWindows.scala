package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the status-event stream —
  * the Structured Streaming surface the reference never had (its
  * browser re-aggregates per-day JSON): arrivals/departures per station
  * per tumbling window, with a watermark bounding state.
  *
  * Works identically on a streaming DataFrame (`readStream` + watermark
  * drops late events and expires window state) and on a batch frame
  * (watermark is a no-op) — one definition, both execution modes.
  *
  * Scale: streaming state is one row per (window, station, event_type);
  * the watermark caps retained windows, so state is O(stations ×
  * windows-in-watermark), independent of event volume.
  */
object EventWindows {

  /** @param events StatusEvent-shaped frame with an `event_ts` TIMESTAMP
    *               column (parse the ISO string upstream).
    * @param windowLength e.g. "5 minutes"
    * @param watermark    e.g. "10 minutes" — max lateness before an
    *                     event is dropped (streaming mode only). */
  def stationTraffic(events: DataFrame, windowLength: String,
      watermark: String): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .groupBy(
        window(col("event_ts"), windowLength).as("w"),
        col("station_name"))
      .agg(
        count(when(col("event_type") === "arrived", 1)).as("arrivals"),
        count(when(col("event_type") === "departed", 1)).as("departures"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("station_name"), col("arrivals"), col("departures"))

  /** Sliding-window variant: overlapping windows every `slide` (must
    * divide or be divided sensibly into `windowLength`; each event lands
    * in windowLength/slide windows). Same watermark/state semantics as
    * [[stationTraffic]]; streaming state grows by the overlap factor —
    * the windowLength/slide ratio IS the state multiplier, keep it
    * small at scale. */
  def stationTrafficSliding(events: DataFrame, windowLength: String,
      slide: String, watermark: String): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .groupBy(
        window(col("event_ts"), windowLength, slide).as("w"),
        col("station_name"))
      .agg(
        count(when(col("event_type") === "arrived", 1)).as("arrivals"),
        count(when(col("event_type") === "departed", 1)).as("departures"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("station_name"), col("arrivals"), col("departures"))

  /** Parse the reference's ISO-offset timestamp strings into event time.
    * `timestamp` strings like 2025-08-21T15:06:02+02:00 parse natively;
    * the session TZ (UTC) normalizes them. */
  def withEventTs(events: DataFrame): DataFrame =
    events.withColumn("event_ts", to_timestamp(col("timestamp")))
}
