package graft

/** Dev tool: time a subset of catalog queries against any table dir
  * (e.g. a /tmp scale-up replica). Usage:
  *   runMain graft.Time <dir> <queryName> [queryName...] */
object Time {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-time")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      println(f"[time] $n%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
