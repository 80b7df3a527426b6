package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * Restart semantics are the caller's choice via `decisionDir`:
  *   - `None` (default, the reference's behavior): the decision is re-made
  *     from the data on every query start — the reference re-evaluates the
  *     deciding term on every eval too. Corollary: after a checkpointed
  *     restart MID-stream, the re-decision sees the first row of the first
  *     batch AFTER the restart, which may be a later element than the
  *     stream's true first.
  *   - `Some(dir)`: the deciding value is persisted to `dir` (Hadoop FS —
  *     local path, HDFS, or an object store next to the query checkpoint)
  *     the moment it is first observed, and every later start of the bound
  *     stream rehydrates THAT value before reading any data, so the
  *     original topology choice survives restarts exactly like checkpointed
  *     operator state. Written once per query lifetime (temp + rename);
  *     single-driver Structured Streaming means no concurrent writers.
  *     Like a checkpoint directory, `dir` MUST be unique to one logical
  *     query: a decision file left in a reused directory is — by design —
  *     rehydrated as "this query already decided", so sharing the dir
  *     across unrelated queries lets one query's first row dictate
  *     another's topology. The deciding value must be
  *     `java.io.Serializable` (row scalars all are); a non-serializable
  *     chooser key fails fast at decision time, not at some later restart.
  */
object StreamBind {

  private def decisionPath(dir: String) = new Path(dir, "bind-decision.bin")

  private def readDecision(s: SparkSession, dir: String): Option[Any] = {
    val p = decisionPath(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = new java.io.ObjectInputStream(fs.open(p))
      try Some(in.readObject()) finally in.close()
    }
  }

  private def writeDecision(s: SparkSession, dir: String, value: Any): Unit = {
    // Fail fast, before any state is written: a non-serializable chooser
    // key in durable mode would otherwise surface only on the write path
    // of a query already running — and a restart would then re-decide,
    // silently losing the durability the caller asked for.
    // null is serializable (ObjectOutputStream round-trips it), and must
    // not fall through to the error path — value.getClass would NPE inside
    // the message, masking the intended IllegalArgumentException.
    if (value != null && !value.isInstanceOf[java.io.Serializable])
      throw new IllegalArgumentException(
        s"durable bind decisions must be java.io.Serializable; got ${value.getClass.getName}")
    val p = decisionPath(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, "bind-decision.tmp")
    val out = new java.io.ObjectOutputStream(fs.create(tmp, true))
    try out.writeObject(value.asInstanceOf[AnyRef]) finally out.close()
    if (!fs.rename(tmp, p) && !fs.exists(p))
      throw new java.io.IOException(s"could not persist bind decision to $p")
  }

  /** Wire `ds` through a first-row-chosen transform into `sink`.
    * `orderCol` names the column that defines "first" within the deciding
    * batch (arrival order across batches is the stream's own order).
    * `decisionDir`, when set, makes the choice durable across restarts —
    * see the object scaladoc for the exact semantics of both modes. */
  def bindStream[T](
      ds: Dataset[T], orderCol: String,
      decisionDir: Option[String] = None)(
      chooser: Any => DataFrame => DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    // rehydrate a persisted decision BEFORE any data is read: a restarted
    // query then runs the original topology even if the post-restart
    // stream's first row would have chosen differently
    @volatile var chosen: Option[DataFrame => DataFrame] =
      decisionDir.flatMap(d => readDecision(ds.sparkSession, d)).map(chooser)
    ds.toDF().writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (chosen.isEmpty && !batch.isEmpty) {
        val first = batch.orderBy(orderCol).select(orderCol).head().get(0)
        decisionDir.foreach(d => writeDecision(batch.sparkSession, d, first))
        chosen = Some(chooser(first))
      }
      chosen.foreach(f => sink(f(batch)))
    }
  }

  /** Convenience: start the bound stream appending rows to an
    * accumulator the caller drains (test/demo sink). */
  def bindToBuffer[T](
      ds: Dataset[T], orderCol: String,
      decisionDir: Option[String] = None)(
      chooser: Any => DataFrame => DataFrame)(
      buffer: java.util.Queue[org.apache.spark.sql.Row]): StreamingQuery =
    bindStream(ds, orderCol, decisionDir)(chooser) { df =>
      df.collect().foreach(buffer.add)
    }.start()
}
