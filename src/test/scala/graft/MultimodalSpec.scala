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

  test("m08: a uniform brightness shift is a near-dup, unrelated content is not") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // values < 200 so the +30 "re-encode" never clamps: every block mean
    // shifts by exactly 30 and all 64 gradient bits survive -> Hamming 0
    val base = Array.fill(2000)(rnd.nextInt(200).toByte)
    val brighter = base.map(b => ((b & 0xff) + 30).toByte)
    val other = Array.fill(2000)(rnd.nextInt(200).toByte)
    val assets = Seq(
      Multimodal.MediaAsset(1L, base, "image/png", 2000L),
      Multimodal.MediaAsset(2L, brighter, "image/png", 2000L),
      Multimodal.MediaAsset(3L, other, "image/png", 2000L)).toDS()
    val pairs = Multimodal.perceptualNearDups(assets).collect()
    // exactly ONE row for the (1,2) pair even though all 4 chunks agree —
    // the minimal-shared-chunk filter replaces a distinct
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(pairs(0).getLong(2) === 0L, "uniform shift must leave every gradient bit")
    // m04's exact checksum CANNOT see this pair: payload bytes differ
    assert(!java.util.Arrays.equals(base, brighter))
  }

  test("m09: a planted two-scene payload yields exactly two segments") {
    import spark.implicits._
    // frames are 1024 bytes: two "scenes" of two frames each, mean bytes
    // 50 then 200 -> one boundary at frame 2, max_delta 150
    val scenes = (Array.fill(2048)(50.toByte) ++ Array.fill(2048)(200.toByte))
    val flat = Array.fill(4096)(80.toByte)
    val assets = Seq(
      Multimodal.MediaAsset(1L, scenes, "image/png", 4096L),
      Multimodal.MediaAsset(2L, flat, "image/png", 4096L)).toDS()
    val rows = Multimodal.shotBoundaries(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq((1L, 4L, 2L, 150L), (2L, 4L, 1L, 0L)))
  }

  test("m08: dHash kernel matches a direct recomputation and skips empty payloads") {
    val a = Multimodal.MediaAsset(7L, Array.tabulate(130)(i => (i % 251).toByte), "image/png", 130L)
    val Some((id, _, c0, c1, c2, c3)) = Multimodal.dHashChunks(a)
    assert(id === 7L)
    val n = 130
    val bright = (0 until 65).map { j =>
      val lo = j * n / 65; val hi = (j + 1) * n / 65
      if (hi == lo) 0L else (lo until hi).map(i => (a.payload(i) & 0xff).toLong).sum / (hi - lo)
    }
    val expect = (0 until 4).map { k =>
      (0 until 16).map(i => if (bright(16 * k + i) > bright(16 * k + i + 1)) 1 << i else 0).sum
    }
    assert(Seq(c0, c1, c2, c3) === expect)
    assert(Multimodal.dHashChunks(
      Multimodal.MediaAsset(8L, Array.empty[Byte], "image/png", 0L)).isEmpty)
  }
}
