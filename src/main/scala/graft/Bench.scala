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
  *  - LOAD ROBUSTNESS (round 17): every timed run stamps the
  *    1-min loadavg and machine-wide JVM count, and after the steady
  *    pass any query whose steady min exceeds 2× its committed
  *    per-query envelope (scripts/bench_envelope.json — regenerated
  *    each round from the exclusive round-end run via
  *    scripts/make_bench_envelope.py) is RE-MEASURED once after a GC +
  *    settle pause. Both values land in a `rechecked` map on the final
  *    summary line and the steady map keeps the min — so a co-tenant
  *    JVM during the driver's run (BENCH_r16's q152 15.99 s vs 6.44 s
  *    exclusive at the same HEAD) can no longer manufacture a phantom
  *    3× regression in the official artifact.
  * Queries run in sorted name order for run-to-run comparability.
  */
object Bench {

  private def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** 1-min loadavg (OS-reported). Sampled before the run for machine
    * context, and after every timed query for per-query stamping. */
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

  /** One timed measurement with its machine context (sampled right
    * after the run, when any co-tenant that inflated it is still
    * visible). sec = -1 on failure. */
  final case class Timed(sec: Double, load1: Double, jvms: Int)

  /** The committed per-query steady envelope (short keys → seconds)
    * from the last EXCLUSIVE round-end bench. Flat JSON, parsed with a
    * regex — no JSON library on the runtime classpath needed. Missing
    * file (fresh checkout mid-edit, or a path-relocated run) degrades
    * to an empty envelope: no rechecks, loudly logged. */
  private[graft] def loadEnvelope(): Map[String, Double] =
    loadEnvelope(sys.env.getOrElse("BENCH_ENVELOPE",
      "scripts/bench_envelope.json"))

  private[graft] def loadEnvelope(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) { System.err.println(s"[bench] no envelope at $path" +
      " — recheck pass disabled"); return Map.empty }
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // full JSON number syntax — the old char-class ([0-9.eE+]) had no
    // '-' INSIDE it, so a negative exponent like 1e-05 matched as "1e"
    // and .toDouble crashed the whole bench at startup
    val entry = """"([^"]+)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)""".r
    entry.findAllMatchIn(txt).flatMap { m =>
      scala.util.Try(m.group(2).toDouble).toOption.map(m.group(1) -> _)
    }.toMap
  }

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
    // Machine context is sampled right AFTER the run: that is when a
    // co-tenant that inflated this measurement shows in load1/jvms.
    def timedRun(fn: (SparkSession, String) => DataFrame): Timed = {
      val t0 = System.nanoTime()
      val ok = try { materialize(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      val ctx = Timed(if (ok) t else -1.0, loadAvg1, jvmCount)
      dropStaleBlocks()
      ctx
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
    // Each steady entry keeps the CONTEXT of the run that produced the
    // min, so the artifact shows the machine state behind every number.
    val steadyFirst = results.map { case (name, single) =>
      if (single.sec < 0) name -> single
      else {
        val fn = SparkEntry.queries(name)
        val times = single +: (0 until 2).map(_ => timedRun(fn))
        name -> (if (times.exists(_.sec < 0)) Timed(-1.0, loadAvg1, jvmCount)
                 else times.minBy(_.sec))
      }
    }

    // ---- recheck pass (round 17) --------------------------------------
    // Queries whose steady min reads >2× their committed exclusive-run
    // envelope are re-measured ONCE each, after a GC + settle pause at
    // the very end of the run (co-tenants that contaminated the main
    // passes have usually finished by now; their presence either way is
    // stamped in the recheck's own load1/jvms). The steady map keeps
    // min(before, after) — min-of-N is the estimator, so a clean
    // recheck corrects a contaminated entry and a still-contaminated
    // recheck changes nothing. Bounded at 20 queries (largest
    // overshoot first): a machine loaded for the WHOLE run would
    // otherwise double the bench.
    val envelope = loadEnvelope()
    def short(name: String): String = name.takeWhile(_ != '_')
    // Two triggers, same recheck (round 18 — the second is new):
    //  1. RATIO: steady min > 2× the envelope, the r17 rule.
    //  2. LOAD-AWARE: among the top-k most expensive queries BY
    //     ENVELOPE (where contamination distorts the artifact most),
    //     any entry over its envelope AT ALL whose min-producing run
    //     was stamped with load1 above a threshold gets re-measured —
    //     BENCH_r17's q152 stood at 1.89× (11.73 s, load1 6.16) just
    //     UNDER the 2× ratio while smaller overshoots were corrected.
    //     The threshold is the contamination boundary, not an idle
    //     bound: this bench alone drives load1 to ~parallelism/4.
    val loadThreshold =
      sys.env.getOrElse("BENCH_RECHECK_LOAD1", "3.0").toDouble
    val topByEnvelope = envelope.toSeq.sortBy(-_._2).take(30)
      .map(_._1).toSet
    val overs = steadyFirst.flatMap { case (name, t) =>
      envelope.get(short(name)) match {
        case Some(env) if t.sec >= 0 && env > 0 &&
            (t.sec > 2 * env ||
              (topByEnvelope(short(name)) && t.sec > env &&
                t.load1 > loadThreshold)) =>
          Some((name, t, t.sec / env))
        case _ => None
      }
    }.sortBy(-_._3).take(20)
    val rechecked: Map[String, (Timed, Timed)] =
      if (overs.isEmpty) Map.empty
      else {
        dropStaleBlocks()
        Thread.sleep(3000) // settle: let the cleaner and any finishing
                           // co-tenant wind down before re-measuring
        overs.map { case (name, before, _) =>
          val fn = SparkEntry.queries(name)
          timedRun(fn) // warm the plan again untimed
          name -> (before, timedRun(fn))
        }.toMap
      }
    val steady = steadyFirst.map { case (name, t) =>
      rechecked.get(name) match {
        case Some((before, after)) if after.sec >= 0 && after.sec < t.sec =>
          name -> after
        case _ => name -> t
      }
    }

    val steadyTotal = steady.map(_._2.sec).filter(_ >= 0).sum
    val steadyTop = steady.filter(_._2.sec >= 0).sortBy(-_._2.sec).take(10)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.sec }
      .mkString("{", ",", "}")
    val steadyQs = steady.map { case (k, v) => "\"" + k + "\":" + v.sec }
      .mkString("{", ",", "}")
    val total = results.map(_._2.sec).filter(_ >= 0).sum
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
    //  - `steady_ctx` stamps [sec, load1, jvms] per query, ascending by
    //    sec for the same truncation survival;
    //  - `steady_top50` carries the top-50 descending in ~650 chars —
    //    guaranteed whole, so per-query comparison below the top-10
    //    works from the artifact alone;
    //  - the LAST line is the short summary (totals + top-10 + load
    //    context + the rechecked map) that always fits whole.
    def shortMap(m: Seq[(String, Double)]): String = m.map { case (k, v) =>
      "\"" + short(k) + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    def ctxMap(m: Seq[(String, Timed)]): String = m.map { case (k, t) =>
      "\"" + short(k) + "\":[" + f"${t.sec}%.3f,${t.load1}%.2f,${t.jvms}]"
    }.mkString("{", ",", "}")
    def recheckedJsonOf(m: Seq[(String, (Timed, Timed))]): String =
      m.map { case (k, (b, a)) =>
        "\"" + short(k) + "\":{\"before\":" + f"${b.sec}%.3f" +
          ",\"before_load1\":" + f"${b.load1}%.2f" +
          ",\"before_jvms\":" + b.jvms +
          ",\"after\":" + f"${a.sec}%.3f" +
          ",\"after_load1\":" + f"${a.load1}%.2f" +
          ",\"after_jvms\":" + a.jvms + "}"
      }.mkString("{", ",", "}")
    val recheckedJson = recheckedJsonOf(rechecked.toSeq.sortBy(_._1))
    // the FINAL summary line must stay inside the collector's ~2000-char
    // tail window even on a fully-contaminated run (20 recheck entries
    // ≈ 2.2 KB alone would push the totals out of the window) — cap it
    // at the 6 largest corrections; the standalone `rechecked` line
    // above carries the complete map
    val recheckedSummary = recheckedJsonOf(
      rechecked.toSeq.sortBy { case (_, (b, a)) => a.sec - b.sec }.take(6))
    println(s"""{"metric":"queries_sec","queries":${shortMap(results.map(kv => kv._1 -> kv._2.sec))}}""")
    println(s"""{"metric":"steady_sec","order":"asc","queries":${shortMap(steady.map(kv => kv._1 -> kv._2.sec).sortBy(_._2))}}""")
    println(s"""{"metric":"steady_ctx","order":"asc","queries":${ctxMap(steady.sortBy(_._2.sec))}}""")
    println(s"""{"metric":"steady_top50","queries":${shortMap(steady.filter(_._2.sec >= 0).map(kv => kv._1 -> kv._2.sec).sortBy(-_._2).take(50))}}""")
    println(s"""{"metric":"rechecked","n_envelope":${envelope.size},"queries":$recheckedJson}""")
    // Load context: a loaded machine inflates every steady time 5–70%
    // (BENCH_r08 vs r09 drifted exactly so on unchanged code) — emit
    // the 1-min loadavg and machine-wide JVM count sampled at START
    // (before this bench loaded the machine) and at END, plus the
    // recheck outcomes, so a future round can tell machine load from a
    // real regression from the final line alone.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"steady_total":$steadyTotal%.3f,"load1_start":$loadStart%.2f,"jvms_start":$jvmsStart,"load1_end":$loadAvg1%.2f,"jvms_end":$jvmCount,"rechecked_n":${rechecked.size},"rechecked":$recheckedSummary,"steady_top10":${shortMap(steadyTop.map(kv => kv._1 -> kv._2.sec))},"sf":"$sfDir"}""")
    spark.stop()
  }
}
