package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode stub emits ceil(n_bytes/frameSize) frames per asset") {
    import spark.implicits._
    val assets = Multimodal.assets(spark, sf).collect()
    val frames = Multimodal.decodeFrames(spark, sf).collect().groupBy(_.asset_id)
    assert(assets.nonEmpty)
    assets.foreach { a =>
      val expected = math.ceil(a.n_bytes.toDouble / Multimodal.FrameSize).toLong
      assert(frames(a.asset_id).length.toLong === expected,
        s"asset ${a.asset_id}: ${frames(a.asset_id).length} frames, want $expected")
    }
  }

  test("frame features are consistent with the payload bytes") {
    val a = Multimodal.assets(spark, sf).filter(_.asset_id == 0L).head()
    val fs = Multimodal.stubDecode(a).toSeq
    assert(fs.map(_.frame_bytes).sum === a.n_bytes)
    assert(fs.map(_.byte_sum).sum === a.payload.map(b => (b & 0xff).toLong).sum)
    assert(fs.forall(f => f.byte_min >= 0 && f.byte_max <= 255))
  }

  test("sampleFrames keeps every k-th frame") {
    val frames = Multimodal.decodeFrames(spark, sf)
    val sampled = Multimodal.sampleFrames(frames, 2).collect()
    assert(sampled.nonEmpty)
    assert(sampled.forall(_.frame_no % 2 == 0))
  }
}
