package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing (SURVEY.md §2.2 LLM ops): media payloads are
  * opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extract / frame-sample run as distributed per-partition batch
  * transforms over those binary columns.
  *
  * The actual codec is STUBBED (no image/audio libs in this container):
  * [[DecodedFrame]] values are produced by [[stubDecode]], a deterministic
  * fake that derives "frames" from the payload bytes. Everything around the
  * stub — schema, encoders, partitioning, batch iteration shape — is the
  * real Spark plumbing a production decoder would drop into (swap
  * `stubDecode` for a JNI/FFmpeg call; signature unchanged).
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  case class MediaAsset(
      asset_id: Long,
      payload: Array[Byte],
      media_type: String,
      n_bytes: Long)

  /** One decoded "frame": fixed-size window of the payload with summary
    * features (a real decoder would emit pixel/PCM features here). */
  case class DecodedFrame(
      asset_id: Long,
      frame_no: Long,
      frame_bytes: Long,
      byte_sum: Long,
      byte_min: Int,
      byte_max: Int)

  val FrameSize = 1024

  // m06 shard assembly — declared above `val all` (oracle strings
  // interpolate these eagerly during Seq construction)
  val ShardBytes = 16384L
  val ShardGroups = 4L
  private def polyHashSqlOf(e: String): String = TextQueries.polyHashSqlOf(e)

  /** STUB decoder: deterministic, derived only from payload bytes. Replace
    * with a real codec; the per-partition batching (one iterator pass, no
    * per-row setup cost) is the production shape.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * val a = MediaAsset(1L, Array.fill[Byte](2058)(2), "image/png", 2058L)
    * stubDecode(a).map(_.frame_bytes).toSeq == Seq(1024L, 1024L, 10L)
    * }}}
    */
  def stubDecode(a: MediaAsset): Iterator[DecodedFrame] =
    a.payload.grouped(FrameSize).zipWithIndex.map { case (chunk, i) =>
      val unsigned = chunk.map(b => b & 0xff)
      DecodedFrame(a.asset_id, i.toLong, chunk.length.toLong,
        unsigned.map(_.toLong).sum, unsigned.min, unsigned.max)
    }

  /** documents.text reinterpreted as binary payloads — the multimodal
    * ingestion path (in production: spark.read.format("binaryFile") or
    * payload columns in parquet).
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * assets(spark, sfDir).count() > 0  // one asset per document payload
    * }}}
    */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id".as("asset_id"),
        $"text".cast("binary").as("payload"),
        (when($"doc_id" % 2 === 0, "image/png").otherwise("audio/wav")).as("media_type"),
        length($"text".cast("binary")).cast("long").as("n_bytes"))
      .as[MediaAsset]
  }

  /** Distributed decode: per-partition flatMap over the stub codec.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * decodeFrames(spark, sfDir).count() >= assets(spark, sfDir).count()
    * }}}
    */
  def decodeFrames(s: SparkSession, d: String): Dataset[DecodedFrame] = {
    import s.implicits._
    assets(s, d).mapPartitions(_.flatMap(stubDecode))
  }

  /** Frame sampling: every k-th frame (a real video pipeline's keyframe
    * sample), as a plain filter on the decoded stream.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * sampleFrames(decodeFrames(spark, sfDir), 2)  // only even frame_no survive
    * }}}
    */
  def sampleFrames(frames: Dataset[DecodedFrame], k: Int): Dataset[DecodedFrame] =
    frames.filter(_.frame_no % k == 0)

  val all: Seq[QueryDef] = Seq(

    // ----- metadata + checksum pipeline (oracle-checkable: the fake payload
    // is the utf-8 text, so DuckDB can recompute byte lengths + md5) --------
    QueryDef(
      "m01_media_metadata",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id".as("asset_id"),
            $"text".cast("binary").as("payload"),
            when($"doc_id" % 2 === 0, "image/png").otherwise("audio/wav").as("media_type"))
          .select($"asset_id", $"media_type",
            length($"payload").cast("long").as("n_bytes"),
            md5($"payload").as("checksum"),
            ceil(length($"payload") / lit(FrameSize.toDouble)).cast("long").as("n_frames"))
          .orderBy($"asset_id")
      },
      oracle = Some(s"""
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               CAST(ceil(octet_length(encode(text)) / $FrameSize.0) AS BIGINT) AS n_frames
        FROM documents
        ORDER BY asset_id""")),

    // ----- decode + per-asset frame features --------------------------------
    // The codec is a stub, but it is DETERMINISTIC over the payload bytes,
    // so the per-asset feature aggregates ARE oracle-checkable: frames
    // partition the payload, hence total/min/max over frames equal the
    // same statistics over all payload bytes, and n_frames =
    // ceil(bytes/FrameSize) — all recomputable in DuckDB (fixture text is
    // ASCII, so byte values = ascii codes). Per-frame shape is asserted in
    // MultimodalSpec.
    QueryDef(
      "m02_media_decode_features",
      (s, d) => {
        import s.implicits._
        decodeFrames(s, d)
          .groupBy($"asset_id")
          .agg(count(lit(1)).as("n_frames"),
            sum($"byte_sum").as("total_byte_sum"),
            min($"byte_min").as("min_byte"),
            max($"byte_max").as("max_byte"))
          .orderBy($"asset_id")
      },
      oracle = Some("""
        WITH chars AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, length(text)),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))) AS c
          FROM documents)
        SELECT doc_id AS asset_id,
               CAST(ceil(count(*) / 1024.0) AS BIGINT) AS n_frames,
               CAST(sum(c) AS BIGINT) AS total_byte_sum,
               CAST(min(c) AS INTEGER) AS min_byte,
               CAST(max(c) AS INTEGER) AS max_byte
        FROM chars
        GROUP BY doc_id
        ORDER BY asset_id""")),

    // ----- frame sampling: every k-th decoded frame -------------------------
    // The keyframe-sample shape of a video pipeline. Deterministic over
    // payload bytes, so the per-asset sample count and sampled byte volume
    // are recomputable in DuckDB from frame arithmetic alone:
    // frame i covers bytes [1024*i, min(1024*(i+1), n)).
    QueryDef(
      "m03_frame_sample",
      (s, d) => {
        import s.implicits._
        sampleFrames(decodeFrames(s, d), 2)
          .groupBy($"asset_id")
          .agg(count(lit(1)).as("n_sampled"),
            sum($"frame_bytes").as("sampled_bytes"))
          .orderBy($"asset_id")
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, length(text) AS n,
                 CAST(ceil(length(text) / 1024.0) AS BIGINT) AS nf
          FROM documents
          -- empty payload decodes to zero frames, so the Spark side's
          -- groupBy-over-frames emits no row for it: mirror that here
          WHERE length(text) > 0)
        SELECT doc_id AS asset_id,
               CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
               CAST(list_sum(list_transform(
                 list_filter(generate_series(0, nf - 1), i -> i % 2 = 0),
                 i -> least(1024, n - 1024 * i))) AS BIGINT) AS sampled_bytes
        FROM d
        ORDER BY asset_id""")),

    // ----- content-hash media dedup + storage-reclaim report ----------------
    // The image/audio dedup baseline: assets are duplicates iff their
    // payload BYTES hash equal (codec-independent, so it needs no decode —
    // the one dedup signal that works on any modality unchanged). One
    // map-side-combinable hash agg per (type, checksum) group, then a
    // per-type rollup: asset/unique/duplicate counts and the bytes a
    // keep-canonical pass (min asset_id per group, d07's policy) would
    // reclaim. Same-bytes assets under different media types count per
    // type — cross-type collisions are distinct assets by contract.
    QueryDef(
      "m04_media_dedup",
      (s, d) => {
        import s.implicits._
        // group on the 16-byte checksum, never the payload — only hashes
        // cross the shuffle wire (at 100 TB the payloads are the data)
        assets(s, d).toDF()
          .select($"media_type", md5($"payload").as("checksum"), $"n_bytes")
          .groupBy($"media_type", $"checksum", $"n_bytes")
          .agg(count(lit(1)).as("mult"))
          .groupBy($"media_type")
          .agg(sum($"mult").as("n_assets"),
            count(lit(1)).as("n_unique"),
            (sum($"mult") - count(lit(1))).as("dup_assets"),
            sum(($"mult" - 1) * $"n_bytes").as("wasted_bytes"))
          .orderBy($"media_type")
      },
      oracle = Some("""
        WITH a AS (
          SELECT doc_id AS asset_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
                 md5(text) AS checksum,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents),
        g AS (SELECT media_type, checksum, n_bytes, count(*) AS mult
              FROM a GROUP BY media_type, checksum, n_bytes)
        SELECT media_type,
               CAST(sum(mult) AS BIGINT) AS n_assets,
               count(*) AS n_unique,
               CAST(sum(mult) - count(*) AS BIGINT) AS dup_assets,
               CAST(sum((mult - 1) * n_bytes) AS BIGINT) AS wasted_bytes
        FROM g GROUP BY media_type ORDER BY media_type""")),

    // ----- cross-asset repeated frames (shared intro/outro detection) -------
    // Frame-granular dedup: a frame FINGERPRINT (here the stub decoder's
    // feature tuple; in production a perceptual hash of the pixels/PCM)
    // that appears in >= 2 distinct assets of the same media type marks
    // shared content — title cards, intros, watermark stills. Shape: one
    // hash agg over fingerprints (count distinct assets per fp), one
    // equi-join of the frame table back on the fingerprint — d01's dedup
    // shape at frame granularity. Only the 4-int fingerprint tuple ever
    // crosses the shuffle; payloads stay columnar at the scan. Frame count
    // is bytes/1024 — linear — and the join key is narrow, so the plan
    // survives a 100x scale-up unchanged.
    QueryDef(
      "m05_shared_frames",
      (s, d) => sharedFrames(assets(s, d)),
      oracle = Some("""
        WITH chars AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
                 (i - 1) // 1024 AS frame_no,
                 CAST(ascii(substring(text, i, 1)) AS BIGINT) AS c
          FROM documents, unnest(generate_series(1, length(text))) AS u(i)),
        frames AS (
          SELECT doc_id, media_type, frame_no,
                 count(*) AS fb, sum(c) AS bs, min(c) AS bmin, max(c) AS bmax
          FROM chars GROUP BY doc_id, media_type, frame_no),
        fp AS (
          SELECT media_type, fb, bs, bmin, bmax,
                 count(DISTINCT doc_id) AS na
          FROM frames GROUP BY media_type, fb, bs, bmin, bmax)
        SELECT f.media_type,
               count(*) AS n_frames,
               CAST(sum(CASE WHEN p.na >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_frames,
               CAST(count(DISTINCT (f.fb, f.bs, f.bmin, f.bmax)) AS BIGINT) AS n_fingerprints,
               CAST(max(p.na) AS BIGINT) AS max_assets_per_fp
        FROM frames f
        JOIN fp p ON f.media_type = p.media_type AND f.fb = p.fb
                 AND f.bs = p.bs AND f.bmin = p.bmin AND f.bmax = p.bmax
        GROUP BY f.media_type ORDER BY f.media_type""")),

    // ----- training-shard manifest assembly (webdataset-style) -------------
    // Multimodal training data ships as fixed-size shard archives (tar /
    // webdataset / tfrecord); this builds the shard MANIFEST: assets in a
    // deterministic salted-hash order (retry-stable, decorrelated from
    // ingest order — t19's principle at the asset level), greedily packed
    // into ~ShardBytes shards by a running byte cumsum, one manifest row
    // per shard. Parallelism comes from (media_type x hash-group)
    // partitions — the t08 sharding discipline: window state is O(1) per
    // partition and the shuffle carries (id, bytes) pairs, never payloads.
    // A shard overruns its budget by at most one asset (the greedy
    // sequential rule, deterministic on both engines).
    QueryDef(
      "m06_shard_manifest",
      (s, d) => {
        import s.implicits._
        val orderH = graft.functions.TextFns.polyHash(
          concat(lit("order:"), $"asset_id".cast("string")))
        val grpH = pmod(graft.functions.TextFns.polyHash(
          concat(lit("shard:"), $"asset_id".cast("string"))), lit(ShardGroups))
        val w = Window.partitionBy($"media_type", $"grp").orderBy($"h", $"asset_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        assets(s, d)
          .select($"asset_id", $"media_type", $"n_bytes",
            grpH.as("grp"), orderH.as("h"))
          .withColumn("cum", sum($"n_bytes").over(w))
          .withColumn("shard_id",
            floor(($"cum" - $"n_bytes") / ShardBytes).cast("long"))
          .groupBy($"media_type", $"grp", $"shard_id")
          .agg(count(lit(1)).as("n_assets"),
            sum($"n_bytes").as("shard_bytes"),
            min($"asset_id").as("first_asset"))
          .withColumn("fill_milli",
            floor($"shard_bytes" * lit(1000.0) / ShardBytes).cast("long"))
          .orderBy($"media_type", $"grp", $"shard_id")
      },
      oracle = Some(s"""
        WITH a AS (
          SELECT doc_id AS asset_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
                 CAST(length(text) AS BIGINT) AS n_bytes,
                 (${polyHashSqlOf("'shard:' || CAST(doc_id AS VARCHAR)")}) % $ShardGroups AS grp,
                 (${polyHashSqlOf("'order:' || CAST(doc_id AS VARCHAR)")}) AS h
          FROM documents),
        c AS (
          SELECT *, sum(n_bytes) OVER (PARTITION BY media_type, grp
                      ORDER BY h, asset_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM a),
        sh AS (
          SELECT media_type, grp, (cum - n_bytes) // $ShardBytes AS shard_id,
                 asset_id, n_bytes
          FROM c)
        SELECT media_type, CAST(grp AS BIGINT) AS grp, CAST(shard_id AS BIGINT) AS shard_id,
               CAST(count(*) AS BIGINT) AS n_assets,
               CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
               CAST(min(asset_id) AS BIGINT) AS first_asset,
               CAST(floor(sum(n_bytes) * 1000.0 / $ShardBytes) AS BIGINT) AS fill_milli
        FROM sh GROUP BY media_type, grp, shard_id
        ORDER BY media_type, grp, shard_id""")),

    // ----- random-access shard index (m07) ----------------------------------
    // m06 packs assets into shards; this emits the per-asset INDEX a
    // training loader actually seeks with: (asset -> shard, byte offset,
    // length). Offsets are the same deterministic byte cumsum rebased to
    // each shard's start (a window min over the shard's assets), so
    // within every shard offsets are contiguous — offset + length =
    // next offset, first offset 0 (EdgeCase-gated). Same one partition
    // shuffle as m06; only (id, bytes) integers ever move, payloads
    // never do. webdataset-style .idx files are exactly this table.
    QueryDef(
      "m07_shard_index",
      (s, d) => {
        import s.implicits._
        val orderH = graft.functions.TextFns.polyHash(
          concat(lit("order:"), $"asset_id".cast("string")))
        val grpH = pmod(graft.functions.TextFns.polyHash(
          concat(lit("shard:"), $"asset_id".cast("string"))), lit(ShardGroups))
        val w = Window.partitionBy($"media_type", $"grp").orderBy($"h", $"asset_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ws = Window.partitionBy($"media_type", $"grp", $"shard_id")
        assets(s, d)
          .select($"asset_id", $"media_type", $"n_bytes",
            grpH.as("grp"), orderH.as("h"))
          .withColumn("pre", sum($"n_bytes").over(w) - $"n_bytes")
          .withColumn("shard_id", floor($"pre" / ShardBytes).cast("long"))
          .withColumn("offset", $"pre" - min($"pre").over(ws))
          .select($"asset_id", $"media_type", $"grp", $"shard_id",
            $"offset", $"n_bytes")
          .orderBy($"media_type", $"grp", $"shard_id", $"offset")
      },
      oracle = Some(s"""
        WITH a AS (
          SELECT doc_id AS asset_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
                 CAST(length(text) AS BIGINT) AS n_bytes,
                 (${polyHashSqlOf("'shard:' || CAST(doc_id AS VARCHAR)")}) % $ShardGroups AS grp,
                 (${polyHashSqlOf("'order:' || CAST(doc_id AS VARCHAR)")}) AS h
          FROM documents),
        c AS (
          SELECT *, CAST(sum(n_bytes) OVER (PARTITION BY media_type, grp
                      ORDER BY h, asset_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes
                    AS BIGINT) AS pre
          FROM a),
        sh AS (SELECT *, pre // $ShardBytes AS shard_id FROM c)
        SELECT asset_id, media_type, CAST(grp AS BIGINT) AS grp,
               CAST(shard_id AS BIGINT) AS shard_id,
               CAST(pre - min(pre) OVER (PARTITION BY media_type, grp, shard_id)
                 AS BIGINT) AS "offset",
               n_bytes
        FROM sh
        ORDER BY media_type, grp, shard_id, "offset"""")),

    // ----- perceptual-hash near-duplicate media (m08) -----------------------
    // m04 catches bit-identical payloads; this catches re-encodes: assets
    // whose 64-bit perceptual dHash differs in <= 3 bits. Candidate
    // generation is d04's pigeonhole — two hashes within Hamming 3 must
    // agree on >= 1 of the 4 16-bit chunks, so candidates come from an
    // equi-join on (chunk_idx, chunk_value), never an all-pairs scan; each
    // pair is emitted exactly once at its MINIMAL shared chunk
    // (StreamDedup's trick — no global distinct shuffle). Only (asset_id,
    // 4 x 16-bit chunks) ever leave the scan; payloads stay columnar.
    // Fixture harness: the corpus is unioned with a deterministic
    // simulated re-encode of every asset (uniform +30 brightness — alters
    // every payload byte, so m04's checksum sees a DIFFERENT file, while
    // every brightness gradient survives), standing in for the second
    // crawl snapshot / re-encoded library a production run diffs. The
    // oracle recomputes the identical hash in DuckDB over both copies and
    // takes the tiny corpus' literal all-pairs Hamming filter — so all
    // 500 hash pipelines, the pairing, and the Hamming arithmetic are
    // value-checked end to end.
    QueryDef(
      "m08_media_near_dup",
      (s, d) => perceptualNearDups(withReencodes(assets(s, d))),
      oracle = Some("""
        WITH src AS (
          SELECT doc_id, length(text) AS n,
                 list_transform(generate_series(1, length(text)),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS cs
          FROM documents WHERE length(text) > 0),
        d AS (
          SELECT doc_id, n, cs FROM src
          UNION ALL
          SELECT doc_id + 1000000, n,
                 list_transform(cs, c -> least(c + 30, 255)) FROM src),
        b AS (
          SELECT doc_id,
                 list_transform(generate_series(0, 64), j ->
                   CASE WHEN ((j + 1) * n) // 65 - (j * n) // 65 = 0 THEN 0
                        ELSE list_sum(cs[(j * n) // 65 + 1 : ((j + 1) * n) // 65])
                             // (((j + 1) * n) // 65 - (j * n) // 65) END) AS br
          FROM d),
        h AS (
          SELECT doc_id, list_transform(generate_series(0, 3), k ->
                   list_sum(list_transform(generate_series(0, 15), i ->
                     CASE WHEN br[16 * k + i + 1] > br[16 * k + i + 2]
                          THEN 1 << i ELSE 0 END))) AS ch
          FROM b)
        SELECT a.doc_id AS asset_a, bb.doc_id AS asset_b,
               CAST(bit_count(xor(a.ch[1], bb.ch[1])) + bit_count(xor(a.ch[2], bb.ch[2]))
                  + bit_count(xor(a.ch[3], bb.ch[3])) + bit_count(xor(a.ch[4], bb.ch[4]))
                 AS BIGINT) AS hamming
        FROM h a JOIN h bb ON a.doc_id < bb.doc_id
        WHERE bit_count(xor(a.ch[1], bb.ch[1])) + bit_count(xor(a.ch[2], bb.ch[2]))
            + bit_count(xor(a.ch[3], bb.ch[3])) + bit_count(xor(a.ch[4], bb.ch[4])) <= 3
        ORDER BY asset_a, asset_b""")),

    // ----- shot / segment boundary detection (m09) --------------------------
    // The video-pipeline cut detector: a segment boundary wherever a
    // frame's feature (here the stub decoder's mean byte — a real decoder
    // uses luma histograms) jumps by >= 8 from the previous frame. Shape:
    // the decoded frame stream shuffles ONCE to the asset key; deltas are
    // a lag window bounded by per-asset frame counts; the report is one
    // O(assets) aggregate (frame count, segment count, largest jump). The
    // oracle recomputes frame means from payload bytes with m02's char
    // arithmetic and replays the same lag — so every per-frame feature
    // value is hash-checked, boundaries or not.
    QueryDef(
      "m09_shot_boundaries",
      (s, d) => shotBoundaries(assets(s, d)),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, length(text) AS n,
                 list_transform(generate_series(1, length(text)),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS cs
          FROM documents WHERE length(text) > 0),
        fr AS (
          SELECT doc_id, i,
                 list_sum(cs[1024 * i + 1 : least(1024 * (i + 1), n)])
                   // (least(1024 * (i + 1), n) - 1024 * i) AS bmean
          FROM (SELECT doc_id, n, cs,
                       unnest(generate_series(0, CAST(ceil(n / 1024.0) AS BIGINT) - 1)) AS i
                FROM d)),
        l AS (
          SELECT doc_id, bmean,
                 lag(bmean) OVER (PARTITION BY doc_id ORDER BY i) AS prev
          FROM fr)
        SELECT doc_id AS asset_id, CAST(count(*) AS BIGINT) AS n_frames,
               CAST(1 + sum(CASE WHEN prev IS NOT NULL AND abs(bmean - prev) >= 8
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
               CAST(coalesce(max(abs(bmean - prev)), 0) AS BIGINT) AS max_delta
        FROM l GROUP BY doc_id ORDER BY asset_id""")))

  /** 64-bit perceptual difference-hash (dHash family) of an asset, kept as
    * 4 x 16-bit chunks for m08's pigeonhole bucketing. The payload splits
    * into 65 equal-width blocks; "brightness" is the stub decoder's
    * per-block mean byte (a real image pipeline uses downsampled pixel
    * luma — swap the byte loop, keep the shape); bit i = brightness(i) >
    * brightness(i+1). Gradient bits survive uniform brightness/volume
    * changes that break m04's exact checksum. Empty payloads have no hash.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * val ramp = Array.tabulate[Byte](650)(i => (i / 10).toByte)
    * val a = MediaAsset(1L, ramp, "image/png", 650L)
    * val brighter = a.copy(payload = ramp.map(b => ((b & 0xff) + 30).toByte))
    * dHashChunks(a) == dHashChunks(brighter.copy(asset_id = 1L))
    *   // gradient bits survive the +30 shift that breaks exact checksums
    * }}}
    */
  def dHashChunks(a: MediaAsset): Option[(Long, String, Int, Int, Int, Int)] = {
    val n = a.payload.length
    if (n == 0) None
    else {
      val bright = new Array[Long](65)
      var j = 0
      while (j < 65) {
        val lo = (j.toLong * n / 65).toInt
        val hi = ((j + 1).toLong * n / 65).toInt
        var sum = 0L
        var i = lo
        while (i < hi) { sum += (a.payload(i) & 0xff); i += 1 }
        bright(j) = if (hi == lo) 0L else sum / (hi - lo)
        j += 1
      }
      def chunk(k: Int): Int = {
        var c = 0
        var i = 0
        while (i < 16) {
          if (bright(16 * k + i) > bright(16 * k + i + 1)) c |= 1 << i
          i += 1
        }
        c
      }
      Some((a.asset_id, a.media_type, chunk(0), chunk(1), chunk(2), chunk(3)))
    }
  }

  /** The m05 pipeline over an arbitrary asset set: per-media-type frame
    * counts, frames whose fingerprint appears in >= 2 distinct assets of
    * that type, distinct fingerprints, and the hottest fingerprint's
    * asset count.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * val p = Array.fill[Byte](2048)(7)
    * sharedFrames(Seq(MediaAsset(1L, p, "image/png", 2048L),
    *   MediaAsset(2L, p.clone(), "image/png", 2048L)).toDS())
    *   // all 4 decoded frames shared across the two assets
    * }}}
    */
  def sharedFrames(a: Dataset[MediaAsset]): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    // media_type rides along through the decode — no frames-to-assets
    // join afterwards (at scale that join would re-shuffle every frame)
    val f = a.mapPartitions(_.flatMap(x => stubDecode(x).map(fr =>
        (x.media_type, fr.asset_id, fr.frame_bytes, fr.byte_sum, fr.byte_min, fr.byte_max))))
      .toDF("media_type", "asset_id", "frame_bytes", "byte_sum", "byte_min", "byte_max")
    val fpKey = Seq("media_type", "frame_bytes", "byte_sum", "byte_min", "byte_max")
    val fp = f.groupBy(fpKey.map(col): _*)
      .agg(countDistinct($"asset_id").as("na"))
    f.join(fp, fpKey)
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_frames"),
        sum(($"na" >= 2).cast("long")).as("shared_frames"),
        countDistinct(
          $"frame_bytes", $"byte_sum", $"byte_min", $"byte_max").as("n_fingerprints"),
        max($"na").as("max_assets_per_fp"))
      .orderBy($"media_type")
  }

  /** m08's fixture harness: every asset plus a deterministic simulated
    * re-encode (uniform +30 brightness, clamped at 255; id offset by 1M) —
    * a transform that changes every payload byte yet preserves every
    * dHash gradient bit. Production feeds two real snapshots instead.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * withReencodes(oneAsset).collect().map(_.asset_id).sorted
    *   // Array(1L, 1000001L): original + deterministic re-encode
    * }}}
    */
  def withReencodes(a: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    val s = a.sparkSession
    import s.implicits._
    a.union(a.map(x => MediaAsset(x.asset_id + 1000000L,
      x.payload.map(b => math.min((b & 0xff) + 30, 255).toByte),
      x.media_type, x.n_bytes)))
  }

  /** The m09 pipeline over an arbitrary asset set: per asset, the decoded
    * frame count, the number of segments cut wherever the frame mean-byte
    * feature jumps by >= 8 from the previous frame, and the largest jump.
    * One shuffle to the asset key; windows bounded by per-asset frames.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * val payload = Array.fill[Byte](1024)(0) ++ Array.fill[Byte](1024)(100)
    * shotBoundaries(Seq(MediaAsset(1L, payload, "video/mp4", 2048L)).toDS())
    *   // (1, 2 frames, 2 segments, max_delta 100)
    * }}}
    */
  def shotBoundaries(a: Dataset[MediaAsset]): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val f = a.mapPartitions(_.flatMap(stubDecode)).toDF()
      .withColumn("bmean", expr("byte_sum div frame_bytes"))
      .withColumn("prev",
        lag($"bmean", 1).over(Window.partitionBy($"asset_id").orderBy($"frame_no")))
      .withColumn("delta", when($"prev".isNotNull, abs($"bmean" - $"prev")))
    f.groupBy($"asset_id")
      .agg(count(lit(1)).as("n_frames"),
        (lit(1L) + sum(when($"delta" >= 8, 1L).otherwise(0L))).as("n_segments"),
        coalesce(max($"delta"), lit(0L)).as("max_delta"))
      .orderBy($"asset_id")
  }

  /** The m08 pipeline over an arbitrary asset set: (asset_a, asset_b,
    * hamming) for every pair of assets whose perceptual dHashes are within
    * Hamming distance 3. Bucketed, exactly-once, no distinct — see the m08
    * QueryDef notes.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * perceptualNearDups(withReencodes(oneRampAsset))
    *   // (1, 1000001, hamming 0): the re-encode is a perceptual dup
    * }}}
    */
  def perceptualNearDups(a: Dataset[MediaAsset]): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val ph = a.mapPartitions(_.flatMap(dHashChunks))
      .toDF("asset_id", "media_type", "c0", "c1", "c2", "c3")
    val bands = ph.select($"asset_id", $"c0", $"c1", $"c2", $"c3",
      posexplode(array($"c0", $"c1", $"c2", $"c3")).as(Seq("bidx", "bval")))
    val l = bands.columns.foldLeft(bands)((df, c) => df.withColumnRenamed(c, "a_" + c))
    val r = bands.columns.foldLeft(bands)((df, c) => df.withColumnRenamed(c, "b_" + c))
    l.join(r,
        $"a_bidx" === $"b_bidx" && $"a_bval" === $"b_bval" &&
          $"a_asset_id" < $"b_asset_id")
      .withColumn("hamming", expr(
        """CAST(bit_count(a_c0 ^ b_c0) + bit_count(a_c1 ^ b_c1)
              + bit_count(a_c2 ^ b_c2) + bit_count(a_c3 ^ b_c3) AS BIGINT)"""))
      .filter($"hamming" <= 3)
      // exactly-once: keep only the pair's MINIMAL shared chunk index, so
      // multi-chunk agreements never need a distinct
      .filter(expr(
        """a_bidx = 0 OR (a_bidx = 1 AND a_c0 <> b_c0)
           OR (a_bidx = 2 AND a_c0 <> b_c0 AND a_c1 <> b_c1)
           OR (a_bidx = 3 AND a_c0 <> b_c0 AND a_c1 <> b_c1 AND a_c2 <> b_c2)"""))
      .select($"a_asset_id".as("asset_a"), $"b_asset_id".as("asset_b"), $"hamming")
      .orderBy($"asset_a", $"asset_b")
  }
}
