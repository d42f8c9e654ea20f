package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Measurement rules (changed in round 2 — numbers are NOT comparable
  * to BENCH_r01, which timed `df.count()` cold):
  *  - FULL materialization: `queryExecution.toRdd.count()` executes the
  *    query's own physical plan. Plain `df.count()` lets Catalyst prune
  *    every column and drop sorts, so projection-heavy queries would
  *    measure a near-empty plan (verified: a 3.8 s signature pipeline
  *    "benched" at 0.2 s under count()).
  *  - STEADY STATE: each query runs once untimed (codegen compilation,
  *    JIT, parquet footers), then once timed. Engine throughput is the
  *    steady-state number; one-time JVM costs are not the query.
  * Queries run in sorted name order for run-to-run comparability.
  */
object Bench {

  private def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** 1-min loadavg (OS-reported) — sampled BEFORE the run starts so it
    * reflects OTHER work on the machine, not this bench. */
  private def loadAvg1: Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** Machine-wide count of running `java` processes (includes this one
    * and the sbt launcher) — concurrent benches/tests show up here. */
  private def jvmCount: Int =
    Option(new java.io.File("/proc").listFiles).map(_.count { f =>
      f.getName.forall(_.isDigit) && {
        try {
          val p = java.nio.file.Paths.get(f.getPath, "comm")
          new String(java.nio.file.Files.readAllBytes(p)).trim == "java"
        } catch { case _: Throwable => false }
      }
    }).getOrElse(-1)

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg1
    val jvmsStart = jvmCount
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-bench")

    // Dev-only iteration filter (mirrors Verify): GRAFT_ONLY=q134,q104
    // benches just the named prefixes. Unset (the driver) → everything.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").toSeq)
    def wanted(name: String) = only.forall(_.exists(name.startsWith))

    // localCheckpoint blocks from iterative queries accumulate in the
    // BlockManager across the run — by query ~150 the stale blocks
    // evict/spill against the live ones and late heavy queries pay 3×
    // (q152 single-shot 7.8 → 27.5 s, steady unchanged). Nothing is
    // shared between catalog queries, so drop all persisted RDDs after
    // each one.
    def dropStaleBlocks(): Unit = {
      // drain GlobalRank's registry first (unpersists AND releases the
      // driver-side strong refs so the cleaner can reclaim them)
      graft.operators.GlobalRank.releaseCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // ContextCleaner only reclaims shuffle files / broadcasts /
      // checkpoint blocks when the JVM garbage-collects their driver
      // references — with a large heap that can be NEVER across a
      // 500+-run bench, so the accumulated state degrades late heavy
      // queries (q152 steady 5.8 s isolated → 15.9 s at run ~430 of
      // the full catalog, reproduced at 8.6 s after just 8 heavy
      // siblings). An explicit GC per query keeps the cleaner current.
      System.gc()
    }

    // One timed fresh-plan run; success captured EXPLICITLY (the old
    // `try materialize catch -1L` discarded the -1 — a failing query's
    // wall time looked like a valid result). Failures record -1.0.
    def timedRun(fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { materialize(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      dropStaleBlocks()
      if (ok) t else -1.0
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => wanted(kv._1)).map { case (name, fn) =>
      timedRun(fn) // warmup: codegen/JIT/parquet footers, untimed
      name -> timedRun(fn)
    }
    // Steady-state pass for EVERY query: min over 2 more timed runs +
    // the single-shot one, each with a FRESH plan (planning is part of
    // a cold query, but the min isolates execution from one-off
    // Catalyst/codegen variance and first-run checkpoint
    // materialization). With 150+ queries the single-shot total is
    // dominated by the ~0.4 s/query planning floor; the full steady
    // map is the execution-tracking signal for cross-round comparison.
    val steady = results.map { case (name, single) =>
      if (single < 0) name -> -1.0
      else {
        val fn = SparkEntry.queries(name)
        val times = single +: (0 until 2).map(_ => timedRun(fn))
        name -> (if (times.exists(_ < 0)) -1.0 else times.min)
      }
    }
    val steadyTotal = steady.map(_._2).filter(_ >= 0).sum
    val steadyTop = steady.filter(_._2 >= 0).sortBy(-_._2).take(10)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val steadyQs = steady.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Verbose per-query lines first (full names, full precision) — for
    // humans and local diffing: single-shot map, then the FULL steady map.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"steady":$steadyQs,"steady_total":$steadyTotal,"sf":"$sfDir"}""")
    // The harness that collects this output keeps only the final ~2000
    // chars. At 150+ queries even a short-key per-query map outgrows
    // that window, so the tail is laid out so truncation-from-the-head
    // drops only the CHEAP queries:
    //  - `steady_sec` carries the full map sorted ASCENDING by time —
    //    the expensive (round-over-round informative) entries sit at
    //    the END of the line, inside the surviving window;
    //  - `steady_top50` (new) carries the top-50 descending in ~650
    //    chars — guaranteed whole, so per-query comparison below the
    //    top-10 works from the artifact alone;
    //  - the LAST line is the short summary (totals + top-10 + load
    //    context) that always fits whole.
    def shortMap(m: Seq[(String, Double)]): String = m.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"queries_sec","queries":${shortMap(results)}}""")
    println(s"""{"metric":"steady_sec","order":"asc","queries":${shortMap(steady.sortBy(_._2))}}""")
    println(s"""{"metric":"steady_top50","queries":${shortMap(steady.filter(_._2 >= 0).sortBy(-_._2).take(50))}}""")
    // Load context: a loaded machine inflates every steady time 5–70%
    // (BENCH_r08 vs r09 drifted exactly so on unchanged code) — emit
    // the 1-min loadavg and machine-wide JVM count sampled at START
    // (before this bench loaded the machine) and at END, so a future
    // round can tell machine load from a real regression.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"steady_total":$steadyTotal%.3f,"load1_start":$loadStart%.2f,"jvms_start":$jvmsStart,"load1_end":$loadAvg1%.2f,"jvms_end":$jvmCount,"steady_top10":${shortMap(steadyTop)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
