package graft.metrics

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.DayMetrics

/** K4 — yearly metrics JSON merge-writer (reference:
  * src/compute_daily_metrics.py:205–228, 281–293, 322–328).
  *
  * Byte-shape parity with Python's `json.dump(payload, ensure_ascii=False,
  * indent=2)`: 2-space indent, `": "` key separator, non-ASCII characters
  * (ą in 'Poza stacją') written raw, floats in repr form, insertion-order
  * keys. The web UI and golden tests read this exact shape.
  *
  * Merge semantics: read existing file (tolerating the legacy bare-map
  * shape, :210–219), overwrite/append `days[date]`, write the whole file.
  * Existing day order is preserved; new days append at the end — exactly
  * Python dict update semantics.
  *
  * Driver-side by design: one JSON document per year, kilobytes in size;
  * the heavy lifting (the metrics) happened distributed upstream.
  */
object MetricsJson {

  // ---- minimal JSON AST with a Python-json.dump(indent=2) renderer ----

  sealed trait J
  case class JStr(s: String) extends J
  /** Pre-rendered numeric/boolean/null literal. */
  case class JRaw(raw: String) extends J
  case class JArr(items: Seq[J]) extends J
  case class JObj(fields: Seq[(String, J)]) extends J

  def render(j: J, level: Int = 0): String = {
    val pad = "  " * (level + 1)
    val close = "  " * level
    j match {
      case JStr(s)        => q(s)
      case JRaw(r)        => r
      case JArr(Nil)      => "[]"
      case JObj(Nil)      => "{}"
      case JArr(items) =>
        items.map(i => pad + render(i, level + 1))
          .mkString("[\n", ",\n", "\n" + close + "]")
      case JObj(fields) =>
        fields.map { case (k, v) => pad + q(k) + ": " + render(v, level + 1) }
          .mkString("{\n", ",\n", "\n" + close + "}")
    }
  }

  /** JSON string literal, ensure_ascii=False: only control chars, quote
    * and backslash escaped; everything else (incl. ą) raw UTF-8. */
  def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Python float repr: shortest round-trip decimal; plain notation for
    * the magnitudes metrics produce (Python only switches to exponent at
    * 1e16 / 1e-5, Java at 1e7 / 1e-3 — expand those). */
  def pyFloat(d: Double): String = {
    val s = d.toString
    if (!s.contains("E")) s
    else {
      val bd = new java.math.BigDecimal(s)
      val plain = bd.stripTrailingZeros.toPlainString
      if (plain.contains(".")) plain else plain + ".0"
    }
  }

  /** DayMetrics → AST, reference field order, WITHOUT the `date` key
    * (popped before storing, reference :286–287, :325–326). */
  def dayAst(m: DayMetrics): J = JObj(Seq(
    "total_rides" -> JRaw(m.total_rides.toString),
    "bike_rentals_histogram" -> JObj(
      m.bike_rentals_histogram.toSeq.sortBy(_._1.toInt)
        .map { case (k, v) => k -> JRaw(v.toString) }),
    "avg_distance_km" -> JRaw(pyFloat(m.avg_distance_km)),
    "avg_duration_min" -> JRaw(pyFloat(m.avg_duration_min)),
    "total_distance_km" -> JRaw(pyFloat(m.total_distance_km)),
    "total_duration_min" -> JRaw(m.total_duration_min.toString),
    "round_trips" -> JRaw(m.round_trips.toString),
    "left_outside_station" -> JRaw(m.left_outside_station.toString),
    "busiest_stations_top5" -> JArr(m.busiest_stations_top5.map(s => JObj(Seq(
      "station" -> JStr(s.station),
      "arrivals" -> JRaw(s.arrivals.toString),
      "departures" -> JRaw(s.departures.toString),
      "total" -> JRaw(s.total.toString))))),
    "top_routes_top5" -> JArr(m.top_routes_top5.map(r => JObj(Seq(
      "start_station" -> JStr(r.start_station),
      "end_station" -> JStr(r.end_station),
      "rides" -> JRaw(r.rides.toString)))))
  ))

  /** Jackson node (a day loaded from an existing file) → AST, order
    * preserved. */
  def nodeAst(node: JsonNode): J =
    if (node.isObject)
      JObj(node.properties().asScala.toSeq.map(e => e.getKey -> nodeAst(e.getValue)))
    else if (node.isArray) JArr(node.elements().asScala.toSeq.map(nodeAst))
    else if (node.isTextual) JStr(node.asText())
    else if (node.isDouble || node.isFloat) JRaw(pyFloat(node.asDouble()))
    else JRaw(node.toString)

  // ---- file IO ----

  private val mapper = new ObjectMapper()

  /** Read a year file into (year, ordered days map). Missing/corrupt
    * file → (None, empty), like the reference (:205–221). */
  def readYearFile(path: String): (Option[Int], ListMap[String, J]) = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return (None, ListMap.empty)
    try {
      val root = mapper.readTree(Files.readString(p, StandardCharsets.UTF_8))
      if (root == null || !root.isObject) return (None, ListMap.empty)
      val (yr, daysNode) =
        if (root.has("days"))
          (if (root.hasNonNull("year") && root.get("year").canConvertToInt)
            Some(root.get("year").asInt) else None,
            Option(root.get("days")).filter(_.isObject))
        else (None, Some(root: JsonNode)) // legacy bare-map shape
      val days = daysNode match {
        case Some(d) => ListMap(d.properties().asScala.toSeq
          .map(e => e.getKey -> nodeAst(e.getValue)): _*)
        case None => ListMap.empty[String, J]
      }
      (yr, days)
    } catch { case _: Exception => (None, ListMap.empty) }
  }

  def write(path: String, year: Int, days: ListMap[String, J]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val doc = JObj(Seq("year" -> JRaw(year.toString), "days" -> JObj(days.toSeq)))
    Files.write(p, render(doc).getBytes(StandardCharsets.UTF_8))
  }

  /** Single-day append/update mode (reference :313–329): year derived
    * from the date string even if the file holds other years. */
  def mergeDay(path: String, m: DayMetrics): Unit = {
    val year = m.date.take(4).toInt
    val (_, existing) = readYearFile(path)
    write(path, year, existing.updated(m.date, dayAst(m)))
  }

  /** Yearly rebuild mode (reference :267–293): merge all days on top of
    * the existing file content. */
  def mergeYear(path: String, year: Int, all: Seq[DayMetrics]): Unit = {
    val (_, existing) = readYearFile(path)
    val updated = all.foldLeft(existing)((acc, m) => acc.updated(m.date, dayAst(m)))
    write(path, year, updated)
  }
}
