package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a 100 TB training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample stages as
  * `mapPartitions` operators over typed rows.
  *
  * The decode step is a clearly-marked STUB ([[StubImageDecoder]]): no
  * imaging/audio libraries exist in this container, so it derives
  * deterministic fake metadata from the payload bytes. Everything
  * AROUND the stub is real and load-bearing:
  *  - schema: (media_id, kind, payload binary) → typed metadata rows;
  *  - partition-parallel execution: the decoder is initialized once per
  *    partition (amortized, like a Pandas-UDF batch iterator) and rows
  *    stream through in bounded batches — no per-row setup, no
  *    collect-to-driver;
  *  - frame sampling is a flatMap (1 row in → N frame rows out), the
  *    generator shape;
  *  - swap [[StubImageDecoder]] for a JNI/javacpp decoder and nothing
  *    else changes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class ImageMeta(media_id: Long, width: Int, height: Int,
      n_frames: Int, format: String)
  case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** Decoder contract. Implementations must be Serializable (shipped to
    * executors) and cheap to `init()` once per partition. */
  trait ImageDecoder extends Serializable {
    def init(): Unit = ()
    def decodeMeta(payload: Array[Byte]): ImageMeta2
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }
  case class ImageMeta2(width: Int, height: Int, nFrames: Int, format: String)

  /** ===== STUB ===== Deterministic fake decoder: derives metadata from
    * the payload bytes (length + leading codepoint). A real deployment
    * replaces this with an actual imaging library; the container has
    * none, per the build brief. The arithmetic is chosen to be exactly
    * reproducible in any SQL engine for oracle checks. */
  object StubImageDecoder extends ImageDecoder {
    override def decodeMeta(payload: Array[Byte]): ImageMeta2 = {
      val len = payload.length
      val first = if (len == 0) 0 else new String(payload, "UTF-8").codePointAt(0)
      ImageMeta2(
        width = 64 + (len % 1856),
        height = 64 + ((len * 31 + first) % 1016),
        nFrames = 1 + (first % 30),
        format = (len % 3) match {
          case 0 => "png"
          case 1 => "jpeg"
          case _ => "webp"
        })
    }
    override def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      payload.take(math.min(payload.length, math.max(1, w * h / 64)))
  }

  /** Decode metadata for every media row — one decoder init per
    * partition, rows streamed in `batchSize` groups (the mapInPandas
    * batch shape). */
  def imageMeta(media: Dataset[MediaRow],
      decoder: ImageDecoder = StubImageDecoder,
      batchSize: Int = 64): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      decoder.init()
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val m = decoder.decodeMeta(r.payload)
          ImageMeta(r.media_id, m.width, m.height, m.nFrames, m.format)
        }
      }
    }
  }

  /** Resize stage: binary in → binary out, metadata preserved. */
  def resized(media: Dataset[MediaRow], w: Int, h: Int,
      decoder: ImageDecoder = StubImageDecoder): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      decoder.init()
      rows.map(r => r.copy(payload = decoder.resize(r.payload, w, h)))
    }
  }

  /** Frame sampling: one video row → every `stride`-th frame row
    * (generator shape; frames faked as payload slices by the stub). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      decoder: ImageDecoder = StubImageDecoder): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      decoder.init()
      rows.flatMap { r =>
        val n = decoder.decodeMeta(r.payload).nFrames
        (0 until n by stride).map { f =>
          Frame(r.media_id, f, decoder.resize(r.payload, 64, 64))
        }
      }
    }
  }

  case class MediaFeatures(media_id: Long, feature: Array[Float])

  /** Feature-extraction stage: payload → fixed-dim float vector, the
    * bridge from the multimodal store into the similarity-search path
    * (VectorIndex / ANN queries). Same partition-parallel contract as
    * [[imageMeta]]; the STUB featurizer samples every 7th codepoint of
    * the decoded payload (deterministic and reproducible in SQL for the
    * oracle — a real deployment swaps in a vision/audio encoder and
    * nothing else changes). Codepoint values are exact in float. */
  def features(media: Dataset[MediaRow], dim: Int = 4,
      decoder: ImageDecoder = StubImageDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      decoder.init()
      rows.map { r =>
        val s = new String(r.payload, "UTF-8")
        val cpLen = s.codePointCount(0, s.length)
        val f = Array.tabulate(dim) { i =>
          val cpIdx = i * 7
          if (cpLen > cpIdx)
            s.codePointAt(s.offsetByCodePoints(0, cpIdx)).toFloat
          else 0f
        }
        MediaFeatures(r.media_id, f)
      }
    }
  }

  /** Adapter: the synthetic documents table as a media table (payload =
    * UTF-8 text bytes) — the testbed for the plumbing above. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload")
    ).as[MediaRow]
  }
}
