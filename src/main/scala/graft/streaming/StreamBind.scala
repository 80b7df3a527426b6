package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Streaming `bind` (reference R9, `combinators.rs:65-73`) in its
  * first-trigger form — the mapping SURVEY.md §7.4 #3 prescribes.
  *
  * rspl's `bind` inspects the first emitted value and *chooses the
  * continuation processor* with it. Structured Streaming query graphs are
  * fixed at start, so data-dependent topology selection happens at the
  * micro-batch boundary instead: a `foreachBatch` driver holds the chosen
  * transformation; the first row that arrives decides it (via `chooser`),
  * and that same batch and every later one flow through the chosen
  * transform into `sink`. This is exactly the reference's semantics
  * restricted to "the decision point is the first element" — which is all
  * `bind` ever observes (`combinators.rs:69-72` drops the lazy rest of
  * the deciding processor).
  *
  * The decision is made once per query lifetime and must be remade on
  * restart from the data (it is intentionally NOT checkpointed: the
  * reference re-evaluates the deciding term on every eval too). Corollary:
  * after a checkpointed restart MID-stream, the re-decision sees the first
  * row of the first batch AFTER the restart — which may be a later element
  * than the stream's true first. Callers that need the original choice to
  * survive restarts must persist the chooser's input themselves (e.g.
  * write the deciding value next to the checkpoint dir and prefer it when
  * present).
  */
object StreamBind {

  /** Wire `ds` through a first-row-chosen transform into `sink`.
    * `orderCol` names the column that defines "first" within the deciding
    * batch (arrival order across batches is the stream's own order). */
  def bindStream[T](
      ds: Dataset[T], orderCol: String)(
      chooser: Any => DataFrame => DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    @volatile var chosen: Option[DataFrame => DataFrame] = None
    ds.toDF().writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (chosen.isEmpty && !batch.isEmpty) {
        val first = batch.orderBy(orderCol).select(orderCol).head().get(0)
        chosen = Some(chooser(first))
      }
      chosen.foreach(f => sink(f(batch)))
    }
  }

  /** Convenience: start the bound stream appending rows to an
    * accumulator the caller drains (test/demo sink). */
  def bindToBuffer[T](
      ds: Dataset[T], orderCol: String)(
      chooser: Any => DataFrame => DataFrame)(
      buffer: java.util.Queue[org.apache.spark.sql.Row]): StreamingQuery =
    bindStream(ds, orderCol)(chooser) { df =>
      df.collect().foreach(buffer.add)
    }.start()
}
