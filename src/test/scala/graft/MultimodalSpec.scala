package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{MediaRow, StubImageDecoder}

/** Multimodal plumbing: typed binary columns, partition-parallel decode,
  * frame-sample generator shape. The decoder is the documented stub. */
class MultimodalSpec extends SparkSpec {

  private def media(n: Int) = {
    import spark.implicits._
    spark.createDataset((1 to n).map { i =>
      MediaRow(i.toLong, "image", ("payload-" * i).getBytes("UTF-8"))
    }).repartition(3)
  }

  test("imageMeta is deterministic and distributed across partitions") {
    val out = Multimodal.imageMeta(media(10)).collect().sortBy(_.media_id)
    assert(out.length === 10)
    val m1 = out.head
    // payload "payload-" (8 bytes), first codepoint 'p' = 112
    assert(m1.width === 64 + 8 % 1856)
    assert(m1.height === 64 + (8 * 31 + 112) % 1016)
    assert(m1.n_frames === 1 + 112 % 30)
    assert(m1.format === "webp") // 8 % 3 = 2
    // rerun → identical (stub is pure)
    assert(Multimodal.imageMeta(media(10)).collect().sortBy(_.media_id)
      .toSeq === out.toSeq)
  }

  test("resized preserves ids and bounds payload size") {
    val out = Multimodal.resized(media(5), 64, 64).collect()
    assert(out.map(_.media_id).sorted.toSeq === (1L to 5L))
    assert(out.forall(_.payload.length <= 64 * 64 / 64))
  }

  test("sampleFrames is a generator: one row in, n_frames/stride out") {
    val rows = media(3)
    val metas = Multimodal.imageMeta(rows).collect().map(m => m.media_id -> m.n_frames).toMap
    val frames = Multimodal.sampleFrames(rows, stride = 2).collect()
    val byId = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    metas.foreach { case (id, n) =>
      assert(byId(id) === (0 until n by 2).size)
    }
    assert(frames.forall(_.frame_no % 2 == 0))
  }

  test("decoder stub matches the oracle arithmetic on real documents") {
    val docs = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Multimodal.imageMeta(Multimodal.mediaFromDocuments(spark, docs))
      .toDF().orderBy("media_id")
    val viaBytes = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")).collect().map { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val m = StubImageDecoder.decodeMeta(bytes)
      (r.getLong(0), m.width, m.height, m.nFrames, m.format)
    }.sortBy(_._1)
    val gotSeq = got.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(gotSeq.toSeq === viaBytes.toSeq)
  }
}
