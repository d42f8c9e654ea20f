package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/row format round-trips beyond parquet: ORC (the other
  * stats-pruning columnar format Spark ships natively) and JSONL (the
  * interchange format document pipelines emit). Writers take the same
  * scale posture as the parquet store: explicit compression, schema
  * carried by the reader (JSONL is schemaless on disk — ALWAYS re-read
  * with the writer's schema, never inference, which at 100 TB would
  * scan the data twice and can widen types between runs).
  */
object Formats {

  def writeOrc(df: DataFrame, path: String,
      compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeJsonl(df: DataFrame, path: String,
      compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Schema-explicit JSONL read (no inference pass — see scaladoc). */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)
}
