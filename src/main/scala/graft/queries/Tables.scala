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

  /** Cheap content fingerprint of one table directory: the sorted
    * (path, length, modificationTime) listing hashed. Driver-side memo
    * caches (e.g. [[Extended28]]'s subspace/day-frame memos) key on
    * `dir + "|" + fingerprint` so a rewrite under a reused path — an
    * append-style store, a long-lived session re-ingesting — invalidates
    * the memo instead of silently serving stale results. One FS listing
    * per call: driver metadata, no Spark job. */
  def fingerprint(s: SparkSession, dir: String, name: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.sortBy(_.getPath.toString).flatMap(c =>
          if (c.isDirectory) walk(c.getPath)
          else Seq(s"${c.getPath}:${c.getLen}:${c.getModificationTime}"))
      else Seq(s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
    }
    java.util.UUID.nameUUIDFromBytes(
      walk(path).mkString("\n").getBytes("UTF-8")).toString
  }

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
