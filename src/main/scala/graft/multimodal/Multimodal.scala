package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * payloads travel as opaque `binary` columns with a typed metadata struct;
 * decode / feature-extract / resize / frame-sample run as partition-local
 * batch transforms.
 *
 * The actual codec step is STUBBED — this container has no image/audio
 * libraries — behind `decodeStub`, a deterministic fake that derives pixel
 * dimensions and "pixels" from the payload bytes. Everything around it is
 * real and load-bearing: the schema contract, the mapPartitions batching
 * (one decoder init per partition, not per row — the Spark-side shape a
 * JNI/FFMPEG decoder needs), partition sizing, and null/corrupt handling.
 */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  final case class MediaMeta(media_type: String, width: Int, height: Int,
                             n_frames: Int, sample_rate: Int)

  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(id: Long, media_type: String,
                                 byte_len: Int, histogram: Array[Double],
                                 mean_luma: Double)

  final case class FrameRow(id: Long, frame_idx: Int, frame: Array[Byte])

  /**
   * Attach a binary payload + metadata struct to any table (here derived
   * deterministically from an id + text column so the fixture reproduces
   * at every scale factor — stands in for `spark.read.format("binaryFile")`).
   */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string")).map { row =>
      val id = row.getLong(0)
      val text = row.getString(1)
      val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val mt = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaRow(id, payload, MediaMeta(mt,
        width = 16 + (id % 16).toInt, height = 16 + (id % 8).toInt,
        n_frames = if (mt == "video") 8 + (id % 8).toInt else 1,
        sample_rate = if (mt == "audio") 16000 else 0))
    }
  }

  /**
   * STUB decoder: a real pipeline would decode the codec here (JPEG/PCM/
   * H.264 via a native library). The deterministic fake returns the raw
   * payload bytes as "pixels" so downstream feature math is testable.
   */
  private def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Byte] =
    if (payload == null) Array.emptyByteArray else payload

  /**
   * Feature extraction over media batches: one `mapPartitions` pass,
   * decoder state initialized once per partition (the batch shape that
   * amortizes native-decoder init at scale), 16-bin byte histogram +
   * mean luminance per row. Corrupt/null payloads yield empty features
   * instead of failing the task.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (native handles, buffers)
      val histBuf = new Array[Double](16)
      rows.map { m =>
        java.util.Arrays.fill(histBuf, 0.0)
        val px = decodeStub(m.payload, m.meta)
        var i = 0
        var lumaSum = 0.0
        while (i < px.length) {
          val b = px(i) & 0xFF
          histBuf(b >> 4) += 1.0
          lumaSum += b
          i += 1
        }
        val n = math.max(px.length, 1)
        MediaFeatures(m.id, m.meta.media_type, px.length,
          histBuf.map(_ / n), lumaSum / n)
      }
    }
  }

  /**
   * Frame sampling for video rows: every `stride`-th frame index becomes a
   * row (payload sliced deterministically — stands in for keyframe
   * extraction). Non-video rows pass through as frame 0.
   */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      if (m.meta.media_type != "video" || m.meta.n_frames <= 1) {
        Iterator.single(FrameRow(m.id, 0, decodeStub(m.payload, m.meta)))
      } else {
        val px = decodeStub(m.payload, m.meta)
        val chunk = math.max(px.length / m.meta.n_frames, 1)
        (0 until m.meta.n_frames by stride).iterator.map { f =>
          val from = math.min(f * chunk, px.length)
          val until = math.min(from + chunk, px.length)
          FrameRow(m.id, f, java.util.Arrays.copyOfRange(px, from, until))
        }
      }
    }
  }

  /**
   * "Resize": re-bucket the fake pixels to a fixed-size feature array
   * (stands in for bilinear resize to a model's input resolution).
   */
  def resizeTo(media: Dataset[MediaRow], targetLen: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val px = decodeStub(m.payload, m.meta)
      val out = new Array[Double](targetLen)
      if (px.nonEmpty) {
        var i = 0
        while (i < targetLen) {
          val src = (i.toLong * px.length / targetLen).toInt
          out(i) = (px(src) & 0xFF).toDouble / 255.0
          i += 1
        }
      }
      (m.id, out)
    }.toDF("id", "resized")
  }
}
