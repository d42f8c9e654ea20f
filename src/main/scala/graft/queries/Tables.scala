package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared parquet table loader for the synthetic testdata tables.
  *
  * The driver-generated `events` table stores `ts` as parquet
  * INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as plain longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild the timestamp at
  * micros precision — lossless here (the generator emits micro-precision
  * values) and identical to what DuckDB's oracle sees.
  */
object Tables {

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so users can drive the
    * engine through plain `spark.sql(...)` (the reference's SQL surface). */
  def registerAll(s: SparkSession, dir: String): Unit =
    All.foreach(n => load(s, dir, n).createOrReplaceTempView(n))

  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      // integer `div`, NOT `/`: nanos-since-epoch (~1.7e18) overflows a
      // double's 53-bit mantissa, so float division is off by ±1 us.
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
