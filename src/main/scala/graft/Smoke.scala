package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's t1 gate: SparkEntry.entry must return
  * rows > 0 on sf0.001. Prints the row count and the first rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (must be > 0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
