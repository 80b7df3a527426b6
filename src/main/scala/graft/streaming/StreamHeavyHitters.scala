package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** q53's Misra–Gries heavy-hitters summary maintained over a key STREAM —
  * the deployment shape of a mergeable summary: each micro-batch runs the
  * distributed typed Aggregator (map-side partials, O(k) per task), and the
  * driver folds the batch's O(k) result into an O(k) running summary with
  * the same merge the Aggregator uses internally. State never grows with
  * the stream, and the deterministic MG bounds (never overestimate,
  * underestimate ≤ floor(n/(k+1)), every key above that threshold tracked)
  * hold for the WHOLE stream regardless of how it was split into batches —
  * asserted in StreamingSpec against exact counts.
  *
  * Unlike the bottom-k sample (membership is a pure function of doc id), a
  * counting summary cannot drop re-delivered ROWS: at-least-once delivery
  * would double-count. Idempotence is therefore per micro-batch: foreachBatch
  * re-delivers a failed batch under the SAME batchId, so folding each
  * batchId at most once makes the fold effectively-once end to end.
  */
object StreamHeavyHitters {

  /** The running summary. Thread-safe: merges run on the micro-batch
    * thread, readers on the application thread. */
  final class HHState private[StreamHeavyHitters] (k: Int) {
    private val mg = new MisraGries(k)
    @volatile private var cur: Map[Long, Long] = Map.empty
    @volatile private var seen: Long = 0L
    @volatile private var lastBatch: Long = -1L

    private[graft] def merge(batchId: Long, keys: Dataset[Long]): Unit =
      synchronized {
        if (batchId <= lastBatch) return // foreachBatch retry: already folded
        val batchSummary = keys.select(mg.toColumn).head()
        cur = mg.merge(cur, batchSummary)
        seen += keys.count()
        lastBatch = batchId
      }

    /** Summary as of the last completed micro-batch (size ≤ k). */
    def summary: Map[Long, Long] = cur

    /** Rows folded so far — the n in the MG bound floor(n/(k+1)). */
    def total: Long = seen
  }

  /** Start the summary over a streaming frame whose FIRST column is the
    * (castable-to-long) key. Returns the running query and live state. */
  def start(keys: DataFrame, k: Int): (StreamingQuery, HHState) = {
    require(keys.isStreaming, "StreamHeavyHitters.start needs a streaming DataFrame")
    val state = new HHState(k)
    val q = keys.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        state.merge(batchId,
          batch.select(col(batch.columns.head).cast("long"))
            .as[Long](Encoders.scalaLong))
      }
      .start()
    (q, state)
  }
}
