package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mm.Multimodal

class MultimodalSpec extends AnyFunSuite {

  test("header encode/decode round-trip for all media types") {
    Seq(0, 1, 2).foreach { t =>
      val blob = Multimodal.synthBlob(12345L, t)
      val m = Multimodal.decodeMeta(blob).get
      assert(m.mediaType == t)
      assert(m.width == 32 + (12345 % 96))
      assert(m.height == 32 + ((12345 >> 7) % 96))
      assert(m.channels == (if (t == 1) 2 else 3))
      assert(m.frames == (if (t == 2) 1 + ((12345 >> 13) % 30) else 1))
    }
  }

  test("malformed blobs decode to None, never throw (100TB-scan safety)") {
    assert(Multimodal.decodeMeta(null).isEmpty)
    assert(Multimodal.decodeMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeMeta("XXXX0123456789".getBytes).isEmpty)
    assert(Multimodal.featureHistogram(null).toSeq == Seq.fill(8)(0f))
  }

  test("feature histogram is L1-normalized and deterministic") {
    val blob = Multimodal.synthBlob(7L, 0)
    val h = Multimodal.featureHistogram(blob)
    assert(h.length == 8)
    assert(math.abs(h.sum - 1.0f) < 1e-4)
    assert(h.toSeq == Multimodal.featureHistogram(Multimodal.synthBlob(7L, 0)).toSeq)
  }

  test("resize rewrites dims; frame sampling strides videos only") {
    val video = Multimodal.synthBlob(99999L, 2)
    val r = Multimodal.resize(video, 64, 48)
    val m = Multimodal.decodeMeta(r).get
    assert(m.width == 64 && m.height == 48)
    val frames = Multimodal.decodeMeta(video).get.frames
    assert(Multimodal.sampleFrames(video, 5).length == (frames + 4) / 5)
    assert(Multimodal.sampleFrames(Multimodal.synthBlob(1L, 0), 5).isEmpty)
    assert(Multimodal.resize(Array[Byte](1), 10, 10) == null)
  }

  test("extractFeatures: partition-local batch transform over a media table") {
    val spark = SparkTestSession.spark
    val media = spark.range(0, 50)
      .selectExpr("id as media_id", "mm_synth_blob(id, cast(id % 3 as int)) as blob")
    val out = Multimodal.extractFeatures(spark, media).collect()
    assert(out.length == 50)
    assert(out.forall(_.getAs[Int]("media_type") >= 0))
    assert(out.forall(_.getAs[Seq[Float]]("features").length == 8))
  }
}
