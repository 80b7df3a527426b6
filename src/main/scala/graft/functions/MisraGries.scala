package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary (a typed [[Aggregator]], so
  * Spark runs it with map-side partial aggregation: each partition builds a
  * k-entry summary, the merge tree combines them — O(k) state per task, no
  * shuffle of the raw keys; the 100 TB alternative to a full groupBy when
  * only the frequent items matter).
  *
  * Deterministic guarantees (hold under ANY partitioning / merge order —
  * the mergeable-summaries bound of Agarwal et al., PODS'12):
  *   - estimate(x) ≤ exact(x)                       (never overestimates)
  *   - estimate(x) ≥ exact(x) − floor(n / (k+1))    (bounded underestimate)
  *   - any x with exact(x) > floor(n / (k+1)) is present in the summary
  * The summary CONTENTS vary with execution order, so queries must emit
  * only order-invariant facts derived from these bounds (q53 emits the
  * guarantee booleans next to exact counts — same convention as q24's
  * sketch-tolerance flags).
  *
  * Reduce is the classic algorithm: increment if tracked, insert if a slot
  * is free, else decrement every counter (the new item's count cancels
  * against the k tracked ones). Merge adds counts pointwise, then subtracts
  * the (k+1)-st largest combined count from everything and drops the
  * non-positive — restoring size ≤ k while adding at most that value to the
  * underestimate, which the bound above absorbs.
  */
final class MisraGries(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1, s"summary size must be >= 1: $k")

  def zero: Map[Long, Long] = Map.empty

  def reduce(b: Map[Long, Long], a: Long): Map[Long, Long] =
    b.get(a) match {
      case Some(c)            => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val combined = y.foldLeft(x) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  def finish(r: Map[Long, Long]): Map[Long, Long] = r

  def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** The deterministic error bound at stream length `n`. */
  def bound(n: Long, k: Int): Long = n / (k + 1)
}
