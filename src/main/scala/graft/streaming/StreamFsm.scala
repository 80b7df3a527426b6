package graft.streaming

import graft.dsl.Keyed
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming execution of the DSL's stateful layer (SURVEY.md §2.1 P1-P4).
  *
  * The batch compiler runs arbitrary `SP` closures per key; a streaming
  * query must *checkpoint* its state, so the streaming contract is the
  * Mealy/FSM form: an explicit serializable state `S` plus a transition
  * `(S, A) => (S, Seq[B])` — exactly what [[graft.dsl.SP.fsm]] takes, and
  * what every reference state machine (`tests/events.rs`,
  * `examples/pelican.rs`) is written as. One `flatMapGroupsWithState`
  * instance per key: state-store-backed, exactly-once under checkpointing,
  * parallel across keys — the streaming twin of the batch
  * `flatMapGroups` fallback (same transition function, same per-key output
  * sequence).
  *
  * Timeout support covers the reference's `EmitTimeoutAfter` feedback
  * pattern (`examples/pelican.rs:323-325,346-367`): instead of an external
  * timer thread feeding events back into the input channel (cycles are
  * impossible in Structured Streaming), a processing-time timeout fires the
  * transition with `None`.
  */
object StreamFsm {

  /** Checkpointable FSM state: user state + per-key emission counter (the
    * counter preserves rspl's output-sequence numbering across batches). */
  final case class FsmState[S](userState: S, emitted: Long)

  /** Run a keyed Mealy machine over a (streaming or batch) Dataset.
    * Within a micro-batch, rows are processed in `seq` order. */
  def fsmStream[S, A, B](ds: Dataset[Keyed[A]], init: S)(
      t: (S, A) => (S, Seq[B]))(
      implicit encLong: Encoder[Long],
      encState: Encoder[FsmState[S]],
      encOut: Encoder[Keyed[B]]): Dataset[Keyed[B]] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[FsmState[S], Keyed[B]](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Keyed[A]], state: GroupState[FsmState[S]]) =>
          val st0 = state.getOption.getOrElse(FsmState(init, 0L))
          var s = st0.userState
          var emitted = st0.emitted
          val out = it.toVector.sortBy(_.seq).flatMap { ka =>
            val (s2, bs) = t(s, ka.value)
            s = s2
            bs.map { b =>
              val kb = Keyed(key, emitted, b)
              emitted += 1
              kb
            }
          }
          state.update(FsmState(s, emitted))
          out.iterator
      }

  /** FSM with a per-key processing-time timeout: when no input arrives for
    * `timeoutMs`, the transition fires with `None` (the pelican
    * `Event::Timeout` analogue) and may emit + change state. */
  def fsmStreamWithTimeout[S, A, B](ds: Dataset[Keyed[A]], init: S, timeoutMs: Long)(
      t: (S, Option[A]) => (S, Seq[B]))(
      implicit encLong: Encoder[Long],
      encState: Encoder[FsmState[S]],
      encOut: Encoder[Keyed[B]]): Dataset[Keyed[B]] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[FsmState[S], Keyed[B]](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: Long, it: Iterator[Keyed[A]], state: GroupState[FsmState[S]]) =>
          val st0 = state.getOption.getOrElse(FsmState(init, 0L))
          var s = st0.userState
          var emitted = st0.emitted
          def emit(bs: Seq[B]): Seq[Keyed[B]] = bs.map { b =>
            val kb = Keyed(key, emitted, b); emitted += 1; kb
          }
          val out =
            if (state.hasTimedOut) {
              // one-shot: fire the None transition, do NOT re-arm (the
              // reference's EmitTimeoutAfter schedules a single timeout;
              // re-arming here would also self-trigger batches forever and
              // never let the query drain)
              val (s2, bs) = t(s, None)
              s = s2
              val o = emit(bs)
              state.update(FsmState(s, emitted))
              o
            } else {
              val o = it.toVector.sortBy(_.seq).flatMap { ka =>
                val (s2, bs) = t(s, Some(ka.value))
                s = s2
                emit(bs)
              }
              state.update(FsmState(s, emitted))
              state.setTimeoutDuration(timeoutMs) // re-armed by input only
              o
            }
          out.iterator
      }
}
