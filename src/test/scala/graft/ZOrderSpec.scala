package graft

import org.apache.spark.sql.functions._

/** Morton key correctness (reference interleave, both encodings, the
  * guard) and the q203 layout invariant the oracle's exact values
  * can't express: z-order must tighten the SECOND dimension's
  * per-bucket ranges vs the natural sort order.
  */
class ZOrderSpec extends SparkSpec {

  private def refMorton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; j <- xs.indices)
      z |= ((xs(j) >> i) & 1L) << (i * xs.length + j)
    z
  }

  test("zvalue == reference bit interleave over a 2-D grid and 3-D samples") {
    import spark.implicits._
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", graft.operators.ZOrder.zvalue(Seq($"x", $"y"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === refMorton(Seq(x, y), 4), s"($x,$y)")
    }
    // known anchors: interleave alternates from the low bit, x first
    assert(got((1L, 0L)) === 1L)
    assert(got((0L, 1L)) === 2L)
    assert(got((15L, 15L)) === 255L)
    val got3 = Seq((5L, 9L, 14L)).toDF("a", "b", "c")
      .withColumn("z",
        graft.operators.ZOrder.zvalue(Seq($"a", $"b", $"c"), 4))
      .collect().head.getLong(3)
    assert(got3 === refMorton(Seq(5L, 9L, 14L), 4))
  }

  test("zvalueSql is the same function as zvalue (cannot drift)") {
    import spark.implicits._
    val df = (0L until 256L).map(i => (i % 16, i / 16)).toDF("x", "y")
    val both = df
      .withColumn("za", graft.operators.ZOrder.zvalue(Seq($"x", $"y"), 4))
      .withColumn("zb",
        expr(graft.operators.ZOrder.zvalueSql(Seq("x", "y"), 4)))
      .filter($"za" =!= $"zb")
    assert(both.count() === 0L)
  }

  test("bits*cols must fit a non-negative long") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      graft.operators.ZOrder.zvalue(Seq($"x", $"y"), 32)
    }
  }

  test("q203: z-order tightens the second dimension; both layouts cover all rows") {
    val rows = graft.queries.Extended20
      .q203(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (natX, natY, _) = rows("natural")
    val (zX, zY, _) = rows("zorder")
    assert(zY < natY,
      s"z-order must tighten y-ranges: zorder $zY vs natural $natY")
    assert(natX < zX,
      "natural order should keep the leading key tighter than z-order" +
        s" — got natural $natX vs zorder $zX (locality didn't trade)")
  }
}
