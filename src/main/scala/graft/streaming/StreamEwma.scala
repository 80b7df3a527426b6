package graft.streaming

import graft.dsl.Keyed
import org.apache.spark.sql.Dataset

/** Incremental per-key EWMA anomaly scoring — the streaming twin of q90,
  * expressed as ONE [[StreamFsm]] Mealy machine (SURVEY §2.1 P1 composing
  * with the monitoring layer): state is (last point time, current ewma),
  * the transition replays q90's exact integer recurrence
  * `e <- (alpha*x + (100-alpha)*e) div 100` and scores each point against
  * the PRIOR ewma (the forecast). Contract and guarantees:
  *
  *  - In-order per key: within a micro-batch the FSM runner processes rows
  *    in `seq` order (callers set seq to the point time); across batches
  *    the source must deliver each key's points in order — the Kafka
  *    partition-per-key contract, same as [[StreamScd2]].
  *  - Redelivery-idempotent: a point at or before the last scored time is
  *    dropped by the state check, so a replayed micro-batch emits nothing
  *    new and leaves the ewma untouched.
  *  - Stream ≡ batch: the recurrence is the same integer fold q90 runs, so
  *    the emitted (baseline, ewma, anomaly) sequence is bit-equal to the
  *    batch kernel for ANY split of the stream (StreamingSpec).
  *
  * State is O(keys x 16 bytes); checkpointable through fsmStreamAuto's
  * transformWithState path under RocksDB.
  */
object StreamEwma {

  /** One series point: time (any monotone long — epoch hours, seconds) and
    * the measured value. */
  final case class Point(t: Long, x: Long)

  /** One scored point: q90's output row shape, per key. */
  final case class Scored(t: Long, x: Long, baseline: Long, ewma: Long,
      devMilli: Long, isAnomaly: Boolean)

  /** EWMA state: time of the last accepted point and the ewma after it.
    * `lastT = Long.MinValue` marks the unseeded state. */
  final case class EwmaState(lastT: Long, ewma: Long)

  def ewmaStream(ds: Dataset[Keyed[Point]], alphaPct: Int = 20,
      anomalyMilli: Long = 500L): Dataset[Keyed[Scored]] = {
    require(0 < alphaPct && alphaPct <= 100, s"alphaPct in (0,100], got $alphaPct")
    val s = ds.sparkSession
    import s.implicits._
    StreamFsm.fsmStreamAuto(ds, EwmaState(Long.MinValue, 0L)) {
      (st: EwmaState, p: Point) =>
        if (st.lastT != Long.MinValue && p.t <= st.lastT) (st, Nil) // redelivered/stale
        else {
          val seeded = st.lastT != Long.MinValue
          val baseline = if (seeded) st.ewma else p.x
          val e2 =
            if (seeded) (alphaPct * p.x + (100 - alphaPct) * st.ewma) / 100 else p.x
          val dev = 1000L * math.abs(p.x - baseline) / math.max(baseline, 1L)
          (EwmaState(p.t, e2),
            Seq(Scored(p.t, p.x, baseline, e2, dev, dev > anomalyMilli)))
        }
    }
  }
}
