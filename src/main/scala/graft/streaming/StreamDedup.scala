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
