package graft.streaming

import graft.operators.DedupQueries
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Incremental near-duplicate detection — dedup AT INGESTION, the shape a
  * training-data pipeline actually needs: as documents stream in, each is
  * checked against everything already admitted and near-dup pairs are
  * emitted immediately, instead of re-running batch dedup over the whole
  * corpus per delivery.
  *
  * Same MinHash-LSH math as the batch d03 pipeline (shared JVM kernels in
  * [[DedupQueries]]): a document explodes into one row per LSH band, rows
  * shuffle to their (band, band_hash) bucket, and a `transformWithState`
  * processor keeps the bucket's history in `ListState`. Exactly-once pair
  * emission WITHOUT a second stateful operator (chained stateful ops need
  * watermarks the corpus doesn't have): a colliding pair is emitted only by
  * the bucket of its MINIMAL shared band — every processor can decide this
  * locally from the two signatures, so no cross-bucket dedup stage exists
  * at all. The emitted pair set over any prefix of the stream equals batch
  * d03 over the same prefix (StreamDedupSpec asserts final-set equality).
  *
  * Scale notes: state is partitioned by (band, band_hash) — the same key
  * the batch self-join shuffles on — and grows with admitted corpus size,
  * the irreducible cost of exact verification; production would store
  * 64-bit shingle HASHES instead of strings (bounded row size; a collision
  * can only perturb a borderline jaccard by ~1/|union|), kept as strings
  * here so stream ≡ batch is bit-exact. An adversarial flood of identical
  * documents concentrates in one bucket (the batch path collapses exact
  * dups first — DedupQueries.minhashNearDupPairs); the streaming analogue
  * is an exact-dup front gate (t05's StreamAdmission) ahead of this
  * operator.
  */
object StreamDedup {

  /** One LSH band row of an incoming document (shingles carried for the
    * exact-jaccard verify at emission time). */
  final case class BandedDoc(docId: Long, band: Int, bh: Long, sh: Seq[String])

  /** A verified near-dup pair, `doc_a < doc_b`, jaccard in milli. */
  final case class NearDupPair(doc_a: Long, doc_b: Long, j_milli: Long)

  /** Bucket history entry: signature cached so the min-shared-band check
    * does not recompute it per comparison. */
  final case class StoredDoc(docId: Long, sig: Seq[Long], sh: Seq[String])

  /** Streaming MinHash-LSH near-dup pairs over a (streaming or batch)
    * DataFrame with `doc_id` and `text` columns. Append-mode output. */
  def nearDupPairsStream(docs: DataFrame): Dataset[NearDupPair] = {
    val s = docs.sparkSession
    import s.implicits._
    DedupQueries.shinglesOf(s, docs)
      .as[(Long, Seq[String])]
      .flatMap { case (id, sh) =>
        val sig = DedupQueries.minhashSigOf(sh)
        (0 until DedupQueries.numBands).iterator
          .map(b => BandedDoc(id, b, DedupQueries.bandHashOf(b, sig), sh))
      }
      .groupByKey(r => (r.band, r.bh))
      .transformWithState(new BucketProcessor, TimeMode.None(), OutputMode.Append(),
        Encoders.product[NearDupPair])
  }

  // ----- semantic twin: incremental embedding sign-LSH dedup ---------------

  /** One LSH table row of an incoming vector: its bucket in table `tbl`,
    * plus the full embedding and all-table bucket array for the
    * min-shared-table decision and exact-cosine verify. */
  final case class BandedVec(vecId: Long, tbl: Int, bucket: Long,
      emb: Seq[Float], buckets: Seq[Long])

  /** A verified semantic near-dup pair, `vec_a < vec_b`, cosine in milli. */
  final case class EmbNearDupPair(vec_a: Long, vec_b: Long, cos_milli: Long)

  private[streaming] final case class StoredVec(vecId: Long, emb: Seq[Float], buckets: Seq[Long])

  /** Streaming sign-LSH embedding near-dup pairs over a (streaming or
    * batch) DataFrame with `vec_id` and `embedding` columns — the semantic
    * twin of [[nearDupPairsStream]], sharing batch d06's bucket and cosine
    * kernels. Exactly-once emission at the pair's MINIMAL shared LSH
    * table, decided locally from the stored bucket arrays. */
  def embeddingNearDupPairsStream(embs: DataFrame,
      tables: Int = DedupQueries.lshTableCount,
      planesPerTable: Int = DedupQueries.lshPlanesPerTableCount,
      minCosMilli: Long = 400L): Dataset[EmbNearDupPair] = {
    val s = embs.sparkSession
    import s.implicits._
    val planes = graft.functions.VectorFns.hyperplanes(
      tables * planesPerTable, DedupQueries.embDim)
    embs.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val bks = DedupQueries.lshBucketsOf(emb, tables, planesPerTable, planes)
        (0 until tables).iterator.map(t => BandedVec(id, t, bks(t), emb.toSeq, bks.toSeq))
      }
      .groupByKey(r => (r.tbl, r.bucket))
      .transformWithState(new VecBucketProcessor(minCosMilli),
        TimeMode.None(), OutputMode.Append(), Encoders.product[EmbNearDupPair])
  }

  // ----- perceptual twin: incremental media dHash dedup --------------------

  /** One pigeonhole chunk row of an incoming asset's 64-bit perceptual
    * dHash (m08's kernel): chunk `idx` of 4, plus all four chunks for the
    * min-shared-chunk decision and the Hamming verify. */
  final case class BandedHash(assetId: Long, idx: Int, chunk: Int, chunks: Seq[Int])

  /** A verified perceptual near-dup pair, `asset_a < asset_b`. */
  final case class MediaNearDupPair(asset_a: Long, asset_b: Long, hamming: Long)

  private[streaming] final case class StoredHash(assetId: Long, chunks: Seq[Int])

  /** Streaming perceptual near-dup pairs over (streaming or batch) media
    * assets — the third modality twin beside the lexical and semantic
    * ones, sharing batch m08's dHash kernel and Hamming-3 pigeonhole.
    * Exactly-once emission at the pair's MINIMAL shared chunk, decided
    * locally from the stored 4-chunk fingerprints; state is O(assets x
    * 16 bytes) per bucket — the smallest of the three twins. */
  def mediaNearDupPairsStream(assets: Dataset[graft.operators.Multimodal.MediaAsset],
      maxHamming: Long = 3L): Dataset[MediaNearDupPair] = {
    val s = assets.sparkSession
    import s.implicits._
    assets.flatMap { a =>
      graft.operators.Multimodal.dHashChunks(a).iterator.flatMap {
        case (id, _, c0, c1, c2, c3) =>
          val cs = Seq(c0, c1, c2, c3)
          cs.zipWithIndex.map { case (c, i) => BandedHash(id, i, c, cs) }
      }
    }
      .groupByKey(r => (r.idx, r.chunk))
      .transformWithState(new HashBucketProcessor(maxHamming),
        TimeMode.None(), OutputMode.Append(), Encoders.product[MediaNearDupPair])
  }

  private final class HashBucketProcessor(maxHamming: Long)
      extends StatefulProcessor[(Int, Int), BandedHash, MediaNearDupPair] {
    @transient private var seen: ListState[StoredHash] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState("seen", Encoders.product[StoredHash], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Int), rows: Iterator[BandedHash],
        tv: TimerValues): Iterator[MediaNearDupPair] = {
      val existing = scala.collection.mutable.ArrayBuffer.empty[StoredHash]
      val it = seen.get()
      while (it.hasNext) existing += it.next()
      val out = Vector.newBuilder[MediaNearDupPair]
      rows.toVector.sortBy(_.assetId).foreach { r =>
        if (!existing.exists(_.assetId == r.assetId)) { // redelivery guard
          existing.foreach { e =>
            var minIdx = -1
            var i = 0
            while (i < r.chunks.length && minIdx < 0) {
              if (e.chunks(i) == r.chunks(i)) minIdx = i
              i += 1
            }
            if (minIdx == key._1) {
              val ham = (0 until r.chunks.length).map(i =>
                java.lang.Integer.bitCount(e.chunks(i) ^ r.chunks(i))).sum.toLong
              if (ham <= maxHamming)
                out += MediaNearDupPair(math.min(e.assetId, r.assetId),
                  math.max(e.assetId, r.assetId), ham)
            }
          }
          val stored = StoredHash(r.assetId, r.chunks)
          existing += stored
          seen.appendValue(stored)
        }
      }
      out.result().iterator
    }
  }

  private final class VecBucketProcessor(minCosMilli: Long)
      extends StatefulProcessor[(Int, Long), BandedVec, EmbNearDupPair] {
    @transient private var seen: ListState[StoredVec] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState("seen", Encoders.product[StoredVec], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedVec],
        tv: TimerValues): Iterator[EmbNearDupPair] = {
      val existing = scala.collection.mutable.ArrayBuffer.empty[StoredVec]
      val it = seen.get()
      while (it.hasNext) existing += it.next()
      val out = Vector.newBuilder[EmbNearDupPair]
      rows.toVector.sortBy(_.vecId).foreach { r =>
        if (!existing.exists(_.vecId == r.vecId)) {
          existing.foreach { e =>
            var minTbl = -1
            var t = 0
            while (t < e.buckets.length && minTbl < 0) {
              if (e.buckets(t) == r.buckets(t)) minTbl = t
              t += 1
            }
            if (minTbl == key._1) {
              val c = DedupQueries.cosMilliOf(e.emb.toArray, r.emb.toArray)
              if (c >= minCosMilli)
                out += EmbNearDupPair(math.min(e.vecId, r.vecId), math.max(e.vecId, r.vecId), c)
            }
          }
          val stored = StoredVec(r.vecId, r.emb, r.buckets)
          existing += stored
          seen.appendValue(stored)
        }
      }
      out.result().iterator
    }
  }

  private final class BucketProcessor
      extends StatefulProcessor[(Int, Long), BandedDoc, NearDupPair] {
    @transient private var seen: ListState[StoredDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState("seen", Encoders.product[StoredDoc], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedDoc],
        tv: TimerValues): Iterator[NearDupPair] = {
      val existing = scala.collection.mutable.ArrayBuffer.empty[StoredDoc]
      val it = seen.get()
      while (it.hasNext) existing += it.next()
      val out = Vector.newBuilder[NearDupPair]
      // docId order within the batch: deterministic regardless of how the
      // stream was chunked into micro-batches
      rows.toVector.sortBy(_.docId).foreach { r =>
        if (!existing.exists(_.docId == r.docId)) { // redelivery guard
          val sigR = DedupQueries.minhashSigOf(r.sh)
          existing.foreach { e =>
            // emit only at the pair's minimal shared band: any other bucket
            // the pair collides in sees minBand < its own band and skips
            var minBand = -1
            var b = 0
            while (b < DedupQueries.numBands && minBand < 0) {
              if (DedupQueries.bandHashOf(b, e.sig.toArray) == DedupQueries.bandHashOf(b, sigR))
                minBand = b
              b += 1
            }
            if (minBand == key._1) {
              val j = DedupQueries.jaccardMilliOf(e.sh, r.sh)
              if (j >= 800)
                out += NearDupPair(math.min(e.docId, r.docId), math.max(e.docId, r.docId), j)
            }
          }
          val stored = StoredDoc(r.docId, sigR.toSeq, r.sh)
          existing += stored
          seen.appendValue(stored)
        }
      }
      out.result().iterator
    }
  }
}
