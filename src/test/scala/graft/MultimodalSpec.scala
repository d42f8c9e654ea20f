package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{JdkImageDecoder, MediaRow, StubImageDecoder}

/** Multimodal plumbing: typed binary columns, partition-parallel decode,
  * frame-sample generator shape. Real PNG/JPEG decode goes through the
  * JDK's built-in javax.imageio ([[JdkImageDecoder]]); the SQL-
  * reproducible stub stays for the oracle rows and exotic kinds. */
class MultimodalSpec extends SparkSpec {

  /** A deterministic 4x3 PNG: per-pixel ARGB from a fixed formula,
    * encoded by the JDK's own writer so the bytes are a real PNG. */
  private def pngFixture: (Array[Byte], Array[Int]) = {
    val (w, h) = (4, 3)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xff000000 | (x * 40 << 16) | (y * 70 << 8) | (x + y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val pixels = img.getRGB(0, 0, w, h, null, 0, w)
    (out.toByteArray, pixels)
  }

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

  test("JdkImageDecoder decodes a real PNG fixture: width/height/format" +
      " goldens and byte-for-byte pixel round-trip") {
    val (png, pixels) = pngFixture
    val m = JdkImageDecoder.decodeMeta(png)
    assert(m.width === 4)
    assert(m.height === 3)
    assert(m.nFrames === 1)
    assert(m.format === "png")
    // PNG is lossless: decoded ARGB must equal what was encoded
    assert(JdkImageDecoder.decodePixels(png).toSeq === pixels.toSeq)
    // JPEG payload decodes too (lossy — only meta is pinned)
    val jout = new java.io.ByteArrayOutputStream()
    val rgb = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(rgb, "jpeg", jout)
    val jm = JdkImageDecoder.decodeMeta(jout.toByteArray)
    assert((jm.width, jm.height, jm.format) === ((4, 3, "jpeg")))
  }

  test("JdkImageDecoder drives the SAME pipeline stages as the stub " +
      "(imageMeta / resized / sampleFrames over real PNG payloads)") {
    import spark.implicits._
    val (png, _) = pngFixture
    val rows = spark.createDataset((1L to 6L).map(i =>
      MediaRow(i, "image", png))).repartition(3)
    val metas = Multimodal.imageMeta(rows, JdkImageDecoder)
      .collect().sortBy(_.media_id)
    assert(metas.length === 6)
    assert(metas.forall(m =>
      m.width == 4 && m.height == 3 && m.format == "png"))
    // resize to 2x2 and decode back: real re-rendered PNG bytes
    val rs = Multimodal.resized(rows, 2, 2, JdkImageDecoder).collect()
    assert(rs.forall { r =>
      val m = JdkImageDecoder.decodeMeta(r.payload)
      m.width == 2 && m.height == 2 && m.format == "png"
    })
    val frames = Multimodal.sampleFrames(rows, stride = 1, JdkImageDecoder)
      .collect()
    assert(frames.length === 6) // 1 frame per still PNG
    assert(frames.forall(f =>
      JdkImageDecoder.decodeMeta(f.payload).width == 64))
  }

  test("JdkImageDecoder fails LOUDLY on an undecodable payload") {
    val e = intercept[IllegalArgumentException] {
      JdkImageDecoder.decodeMeta("not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("no ImageIO reader"))
  }

  test("pixelFeatures: per-channel means/stddevs over REAL decoded " +
    "pixels match the hand-computed golden; deterministic across " +
    "partitionings") {
    import spark.implicits._
    val (png, pixels) = pngFixture
    // golden from the SAME pixel array the fixture hands back — the
    // exact integer channel fold the operator performs, in plain Scala
    def chan(shift: Int) = pixels.map(p => (p >>> shift) & 0xff)
    val golden = Seq(24, 16, 8, 0).map(chan).flatMap { vs =>
      val mean = vs.map(_.toLong).sum.toDouble / vs.length
      val sq = vs.map(v => v.toLong * v).sum.toDouble / vs.length
      Seq(mean.toFloat, math.sqrt(math.max(0.0, sq - mean * mean)).toFloat)
    }
    // golden sanity (interleaved mean/sd per channel): the fixture is
    // opaque (A ≡ 255, sdA ≡ 0) with a genuinely varying R channel
    assert(golden(0) === 255f && golden(1) === 0f)
    assert(golden(3) > 0f, "R channel must actually vary")
    val rows = spark.createDataset(
      (1L to 6L).map(i => MediaRow(i, "image", png))).repartition(4)
    val out = Multimodal.pixelFeatures(rows).collect().sortBy(_.media_id)
    assert(out.length === 6)
    out.foreach { mf =>
      // interleaved golden is (meanA, sdA, meanR, sdR, ...); the
      // operator lays out means first then sds — reorder to compare
      val want = Array(golden(0), golden(2), golden(4), golden(6),
        golden(1), golden(3), golden(5), golden(7))
      assert(mf.feature.toSeq === want.toSeq,
        s"pixel features diverged for media ${mf.media_id}")
    }
  }

  test("pixelFeatures bridges into the ANN path: cosine over the " +
    "real-pixel vectors ranks the duplicate image above distinct ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (pngA, _) = pngFixture
    // a second, genuinely different raster (other ramp direction)
    val imgB = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 3; x <- 0 until 4)
      imgB.setRGB(x, y, 0xff000000 | (y * 80 << 16) | (x * 10 << 8) | 200)
    val outB = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(imgB, "png", outB)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "image", pngA), MediaRow(2L, "image", pngA),
      MediaRow(3L, "image", outB.toByteArray)))
    val feats = Multimodal.pixelFeatures(rows).toDF()
    val cos = feats.as("a").crossJoin(feats.as("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"),
        graft.functions.VectorFns.cosine(
          col("a.feature"), col("b.feature")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(cos((1L, 2L)) > cos((1L, 3L)) && cos((1L, 2L)) > cos((2L, 3L)),
      s"duplicate pair must outrank cross pairs: $cos")
    assert(cos((1L, 2L)) > 0.999999, s"identical images: ${cos((1L, 2L))}")
  }
}
