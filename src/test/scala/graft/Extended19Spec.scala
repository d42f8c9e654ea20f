package graft

import org.apache.spark.sql.functions._

import graft.queries.Extended19

/** Round-11 batch: the megapipeline funnel and its invariants. q198's
  * bucketed-probe plan contract lives in IndexSpec; q199's ADC replay
  * in VectorIndexSpec; all three queries are DuckDB-oracle-gated. */
class Extended19Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q197 funnel: exact stage counts on the sf0.001 fixture") {
    import spark.implicits._
    val got = Extended19.q197(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    // goldens cross-checked against the DuckDB oracle on the same
    // fixture — every stage attrits, none collapses to zero
    assert(got === Seq(
      (0L, "corpus", 500L, 153156L),
      (1L, "lm_quality", 364L, 111041L),
      (2L, "sem_dedup", 360L, 110250L),
      (3L, "decontam", 350L, 107508L),
      (4L, "dsir", 152L, 45304L),
      (5L, "temp_mix", 89L, 25033L),
      (6L, "pack", 20L, 5166L)))
  }

  test("q197 funnel invariants: monotone doc/mass attrition; stages bite") {
    import spark.implicits._
    val rows = Extended19.q197(spark, "/root/testdata/sf0.01")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    val docStages = rows.filter(_._1 <= 5)
    docStages.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} grew docs: ${a._3} -> ${b._3}")
      assert(b._4 <= a._4, s"stage ${b._2} grew mass: ${a._4} -> ${b._4}")
    }
    // every filter stage removes SOMETHING at the gate SF (a stage that
    // never bites is a stage the pipeline doesn't need)
    Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5)).foreach { case (i, j) =>
      assert(docStages(j)._3 < docStages(i)._3,
        s"stage ${docStages(j)._2} removed nothing")
    }
    // pack: batches nonzero, bounded by survivors; token mass under the
    // survivor char mass (BPE-approx tokens are chars/4 rounded up)
    val pack = rows.find(_._1 == 6L).get
    val s5 = docStages.last
    assert(pack._3 >= 1L && pack._3 <= s5._3)
    assert(pack._4 <= s5._4)
  }
}
