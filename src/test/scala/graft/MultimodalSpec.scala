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

  test("m05 flags every frame of an exact-duplicate asset pair as shared") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    // shape invariants over the fixture corpus
    val rows = SparkEntry.queries("m05_shared_frames")(spark, sf)
      .collect().map {
        case Row(mt: String, nf: Long, sh: Long, fps: Long, mx: Long) =>
          (mt, nf, sh, fps, mx)
      }
    assert(rows.map(_._1).toSeq === Seq("audio/wav", "image/png"))
    rows.foreach { case (mt, nf, sh, fps, mx) =>
      assert(sh <= nf, s"$mt: more shared frames than frames")
      assert(fps <= nf, s"$mt: more fingerprints than frames")
      assert(mx >= 1L)
    }
    // plant an exact-duplicate asset pair: EVERY frame of both copies must
    // flag as shared, and the hot fingerprint must report 2 assets
    val payload = Array.tabulate[Byte](2500)(i => (i % 251).toByte)
    val planted = Seq(
      Multimodal.MediaAsset(1L, payload, "video/mp4", payload.length.toLong),
      Multimodal.MediaAsset(2L, payload, "video/mp4", payload.length.toLong),
      Multimodal.MediaAsset(3L, payload.map(b => (b ^ 1).toByte), "image/png",
        payload.length.toLong)
    ).toDS()
    val got = Multimodal.sharedFrames(planted).collect().map {
      case Row(mt: String, nf: Long, sh: Long, fps: Long, mx: Long) =>
        mt -> (nf, sh, fps, mx)
    }.toMap
    assert(got("video/mp4") === ((6L, 6L, 3L, 2L))) // 3 frames x 2 copies, all shared
    assert(got("image/png") === ((3L, 0L, 3L, 1L))) // perturbed copy shares nothing
  }

  test("m06: shard manifest conserves bytes, bounds overflow, and is retry-stable") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run() = SparkEntry.queries("m06_shard_manifest")(spark, sf)
    val rows = run().collect()
    // conservation: every asset byte lands in exactly one shard
    val totalBytes = Multimodal.assets(spark, sf)
      .agg(sum($"n_bytes")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum == totalBytes)
    // greedy bound: a shard exceeds its budget by less than one max asset
    val maxAsset = Multimodal.assets(spark, sf)
      .agg(max($"n_bytes")).collect()(0).getLong(0)
    rows.foreach(r => assert(r.getLong(4) < Multimodal.ShardBytes + maxAsset,
      s"shard overruns by more than one asset: $r"))
    // deterministic: a fresh plan reproduces the manifest bit for bit
    assert(run().collect().toSeq == rows.toSeq)
  }

  test("m07: index offsets are contiguous within every shard and start at zero") {
    val idx = SparkEntry.queries("m07_shard_index")(spark, sf).collect()
      .map(r => ((r.getString(1), r.getLong(2), r.getLong(3)), (r.getLong(4), r.getLong(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    assert(idx.nonEmpty)
    idx.foreach { case (shard, entries) =>
      assert(entries.head._1 === 0L, s"first offset nonzero in $shard")
      entries.sliding(2).foreach {
        case Array((o1, len1), (o2, _)) =>
          assert(o2 === o1 + len1, s"gap in $shard: $o1+$len1 != $o2")
        case _ =>
      }
    }
    // seekability: every (shard, offset) is unique
    val keys = SparkEntry.queries("m07_shard_index")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(keys.distinct.length === keys.length)
  }
}
