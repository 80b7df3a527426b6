package graft.streaming

import graft.dsl.Keyed
import org.apache.spark.sql.Dataset

/** Incremental per-key CUSUM changepoint detection — the streaming twin of
  * q99, on the same [[StreamFsm]] engine as [[StreamEwma]]: state is (last
  * point time, accumulator), the transition replays the exact integer
  * recurrence `g <- max(0, g + x - mean - slack)` and alarms while g
  * exceeds `3 * mean`. Unlike the retrospective batch form (which
  * references the series' own mean), the streaming form takes the
  * reference `mean` as a parameter — the deployed pattern, where the
  * baseline comes from a trained reference window. Contract matches
  * [[StreamEwma]]: in-order per key, stale/replayed points dropped by the
  * state check (redelivery-idempotent), stream ≡ the batch fold of the
  * same series for any micro-batch split. State is O(keys x 16 bytes). */
object StreamCusum {

  final case class Point(t: Long, x: Long)

  final case class Scored(t: Long, x: Long, g: Long, alarm: Boolean)

  final case class CusumState(lastT: Long, g: Long)

  def cusumStream(ds: Dataset[Keyed[Point]], mean: Long,
      slackPctOfMean: Int = 5, alarmMultiple: Long = 3L): Dataset[Keyed[Scored]] = {
    require(mean > 0 && slackPctOfMean >= 0, "need mean > 0, slack >= 0")
    val slack = mean * slackPctOfMean / 100
    val s = ds.sparkSession
    import s.implicits._
    StreamFsm.fsmStreamAuto(ds, CusumState(Long.MinValue, 0L)) {
      (st: CusumState, p: Point) =>
        if (st.lastT != Long.MinValue && p.t <= st.lastT) (st, Nil) // replayed
        else {
          val g = math.max(0L, st.g + p.x - mean - slack)
          (CusumState(p.t, g), Seq(Scored(p.t, p.x, g, g > alarmMultiple * mean)))
        }
    }
  }
}
