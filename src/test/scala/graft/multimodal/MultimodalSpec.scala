package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(90)
  private lazy val media = Multimodal.syntheticMedia(docs, "doc_id", "text").cache()

  test("media rows carry binary payload + typed metadata") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val types = media.map(_.meta.media_type).distinct().collect().toSet
    assert(types === Set("image", "audio", "video"))
    // metadata is type-consistent
    assert(media.filter(m => m.meta.media_type == "audio" && m.meta.sample_rate == 0).count() === 0)
    assert(media.filter(m => m.meta.media_type == "video" && m.meta.n_frames <= 1).count() === 0)
  }

  test("feature extraction: histogram sums to 1, luma in range, deterministic") {
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() === media.count())
    feats.collect().foreach { f =>
      assert(f.histogram.length === 16)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, s"hist must normalize for ${f.id}")
      assert(f.mean_luma >= 0.0 && f.mean_luma <= 255.0)
      assert(f.byte_len > 0)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media)
      .select("id", "mean_luma").as[(Long, Double)].collect().toMap
    feats.collect().foreach(f => assert(again(f.id) === f.mean_luma))
  }

  test("frame sampling: videos explode to stride-sampled frames, others pass through") {
    val frames = Multimodal.sampleFrames(media, stride = 2).cache()
    val perId = frames.groupBy("id").count().as[(Long, Long)].collect().toMap
    media.collect().foreach { m =>
      val expected = if (m.meta.media_type == "video")
        (0 until m.meta.n_frames by 2).size else 1
      assert(perId(m.id) === expected.toLong, s"id ${m.id} (${m.meta.media_type})")
    }
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
  }

  test("resize produces fixed-length normalized features") {
    val resized = Multimodal.resizeTo(media, targetLen = 32)
    val rows = resized.select("resized").as[Seq[Double]].collect()
    assert(rows.forall(_.length === 32))
    assert(rows.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("corrupt/empty payloads do not fail the task") {
    val bad = Seq(Multimodal.MediaRow(1L, Array.emptyByteArray,
      Multimodal.MediaMeta("image", 4, 4, 1, 0))).toDS()
    val f = Multimodal.extractFeatures(bad).collect()
    assert(f.length === 1 && f(0).byte_len === 0)
  }
}
