package graft.streaming

import graft.dsl.Keyed
import org.apache.spark.sql.Dataset

/** Incremental interval-occupancy monitoring — the streaming twin of q104's
  * sweep-line, on the same [[StreamFsm]] engine as [[StreamEwma]] and
  * [[StreamCusum]]. Events are the batch form's +1/-1 boundary rows,
  * delivered per key in sweep order ((t, delta) with the close before the
  * open at a shared instant — the same half-open tie rule q104's sort
  * encodes) and stamped with a strictly increasing per-key `seq`:
  * coincident boundaries are legitimate in this domain, so time alone
  * cannot dedupe redelivery — the seq check can. State is O(keys):
  * (last seq, open now, peak so far); each event emits the LIVE occupancy
  * and running peak — the capacity dashboard q104 computes
  * retrospectively, maintained as data arrives. Stream ≡ the batch fold of
  * the same boundary sequence for any micro-batch split (StreamingSpec). */
object StreamOccupancy {

  /** One interval boundary: `delta` = +1 (open) or -1 (close). */
  final case class Boundary(seq: Long, t: Long, delta: Long)

  final case class Occupancy(seq: Long, t: Long, open: Long, peak: Long)

  final case class OccState(lastSeq: Long, open: Long, peak: Long)

  def occupancyStream(ds: Dataset[Keyed[Boundary]]): Dataset[Keyed[Occupancy]] = {
    val s = ds.sparkSession
    import s.implicits._
    StreamFsm.fsmStreamAuto(ds, OccState(Long.MinValue, 0L, 0L)) {
      (st: OccState, b: Boundary) =>
        if (st.lastSeq != Long.MinValue && b.seq <= st.lastSeq) (st, Nil) // replayed
        else {
          val open = st.open + b.delta
          val peak = math.max(st.peak, open)
          (OccState(b.seq, open, peak), Seq(Occupancy(b.seq, b.t, open, peak)))
        }
    }
  }
}
