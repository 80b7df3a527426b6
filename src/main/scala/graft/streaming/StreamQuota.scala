package graft.streaming

import graft.dsl.Keyed
import org.apache.spark.sql.Dataset

/** Per-key token-bucket quota enforcement over a stream — the admission
  * seat of an ingestion gateway (rate limits per tenant/user/crawler):
  * each key owns a bucket of `capacity` tokens refilled at `refillPerSec`,
  * and every arriving request is admitted iff its cost fits, atomically
  * with the debit. One [[StreamFsm]] Mealy machine (the same engine as
  * [[StreamEwma]]): state is (last seq, last time, tokens) — O(keys x 24
  * bytes), checkpointable via the transformWithState path.
  *
  * Contract and guarantees:
  *  - In-order per key by `seq` (strictly increasing — an event id or
  *    Kafka offset): within a micro-batch the runner sorts by Keyed.seq;
  *    across batches the source must not reorder a key's requests.
  *  - Redelivery-idempotent: a request with seq <= the last decided seq is
  *    dropped, so a replayed micro-batch changes no bucket and emits no
  *    duplicate decision.
  *  - Deterministic: refill is integer `(t - lastT) * refillPerSec`
  *    clamped at capacity; decisions depend only on the request sequence,
  *    never on wall-clock or batch boundaries — stream ≡ the batch replay
  *    of the same fold for ANY micro-batch split (StreamingSpec).
  */
object StreamQuota {

  /** One request: strictly-increasing per-key seq, event-time seconds,
    * cost in tokens. */
  final case class Request(seq: Long, t: Long, cost: Long)

  /** One decision: the request, the bucket level AFTER the decision, and
    * whether it was admitted. */
  final case class Decision(seq: Long, t: Long, cost: Long,
      tokensAfter: Long, admitted: Boolean)

  final case class BucketState(lastSeq: Long, lastT: Long, tokens: Long)

  def quotaStream(ds: Dataset[Keyed[Request]], capacity: Long,
      refillPerSec: Long): Dataset[Keyed[Decision]] = {
    require(capacity > 0 && refillPerSec >= 0, "need capacity > 0, refill >= 0")
    val s = ds.sparkSession
    import s.implicits._
    StreamFsm.fsmStreamAuto(ds, BucketState(Long.MinValue, Long.MinValue, capacity)) {
      (st: BucketState, r: Request) =>
        if (st.lastSeq != Long.MinValue && r.seq <= st.lastSeq) (st, Nil) // replayed
        else {
          val refilled =
            if (st.lastT == Long.MinValue) capacity
            else math.min(capacity,
              st.tokens + math.max(0L, r.t - st.lastT) * refillPerSec)
          val admitted = refilled >= r.cost
          val after = if (admitted) refilled - r.cost else refilled
          (BucketState(r.seq, math.max(st.lastT, r.t), after),
            Seq(Decision(r.seq, r.t, r.cost, after, admitted)))
        }
    }
  }
}
