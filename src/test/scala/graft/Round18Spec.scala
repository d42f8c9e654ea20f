package graft

import org.apache.spark.sql.functions._

/** Round-18 ADVICE/verdict closures pinned as regressions (the
  * Round17Spec discipline): the bench-envelope number grammar and the
  * monitor-bucketing NULL guard. The larger round-18 surfaces
  * (compaction, bloom prefilter, cache, pixel featurizer, e2e
  * wrappers) are pinned in StreamEvalSpec / MultimodalSpec /
  * TextDedupSpec and gated by q291–q294.
  */
class Round18Spec extends SparkSpec {

  test("Bench.loadEnvelope: full JSON number grammar — a negative " +
    "exponent must parse, not crash the bench at startup; a missing " +
    "file degrades to an empty envelope") {
    val f = java.io.File.createTempFile("envelope", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      """{"q1":1.25,"q2":1e-05,"q3":3E+2,"q4":7,"q5":-0.5}"""
        .getBytes("UTF-8"))
    assert(Bench.loadEnvelope(f.getPath) === Map("q1" -> 1.25,
      "q2" -> 1e-05, "q3" -> 300.0, "q4" -> 7.0, "q5" -> -0.5))
    assert(Bench.loadEnvelope(f.getPath + ".does-not-exist")
      === Map.empty[String, Double])
  }

  test("Extended30.mergeBuckets: a NULL bucket value raises loudly " +
    "instead of silently dropping the row from every batch; the " +
    "replay gate still enforces the no-op") {
    import spark.implicits._
    val ok = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("v", "b")
    var merged = Vector.empty[(Long, Long)]
    graft.queries.Extended30.mergeBuckets(ok, col("b")) { (batch, bid) =>
      val n = batch.count()
      // simulate the idempotency gate: the replayed delivery of batch
      // 1 reports 0 merged rows
      if (merged.exists(_._1 == bid)) 0L
      else { merged :+= (bid, n); n }
    }
    assert(merged === Vector((0L, 1L), (1L, 1L), (2L, 1L)))

    val withNull = Seq((1L, Some(0L)), (2L, None), (3L, Some(2L)))
      .toDF("v", "b")
    val e = intercept[Exception] {
      graft.queries.Extended30.mergeBuckets(withNull, col("b")) {
        (batch, _) => batch.count()
      }
    }
    assert(e.getMessage != null)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("NULL bucket")),
      s"expected the loud NULL-bucket message, got: ${messages(e)}")
  }
}
