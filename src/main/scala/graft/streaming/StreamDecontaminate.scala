package graft.streaming

import graft.operators.TextQueries
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The t44 eval-decontamination gate as a live foreachBatch twin — the
  * at-ingestion form the batch operator implies: the heldout benchmark's
  * shingle set is STATIC state (built once at start, an O(heldout
  * shingles) localCheckpoint), and every TRAIN micro-batch is one linear
  * semi-join against it — per-batch cost is O(new train docs), never
  * O(history), because past train docs influence nothing (train-train
  * overlap is out of contract, exactly as in the batch rule).
  *
  * Fold state is one monoid: the per-lang (n_train, n_dropped,
  * tokens_dropped, tokens_clean) sums. Each doc's drop decision depends
  * only on the static heldout set, so the decision is per-row and
  * order-independent, and the sums are split-invariant by construction —
  * after any prefix of the stream [[DecontState.report]] equals
  * [[TextQueries.decontaminateReport]] over heldout + that prefix
  * (StreamingSpec asserts this across micro-batch splits and a restart).
  * State size is O(langs) + the static heldout shingle set.
  *
  * Durable by default ([[StreamIngest.start]]'s contract): the front-door
  * [[start]] requires a `stateDir`, persists the fold per committed batch
  * through [[BatchStateStore]], and the SAME call rehydrates it on
  * restart. The heldout set is an ARGUMENT, not folded state — it is
  * re-derived from the caller's frame on restart, and a persisted
  * fingerprint (count + bit-xor of the shingle keys) fails loudly if a
  * restart passes a different heldout than the one past decisions were
  * made against (silently switching benchmarks would corrupt the fold). */
object StreamDecontaminate {

  final class DecontState(s: SparkSession, stateDir: Option[String],
      private[graft] val heldSh: DataFrame) {

    // the heldout set is static, so its fingerprint is computed once —
    // lazily, so ephemeral states (stateDir = None) that never persist it
    // never pay the localCheckpoint job (the round-8 advisory)
    private lazy val heldFp = heldFingerprint(heldSh).localCheckpoint()

    @volatile private var stats: Option[DataFrame] = None // per-lang sums, unordered
    @volatile private var lastBatchId: Long = -1L
    // one-generation deferred unpersist (StreamDomainGovernance's rule):
    // a report snapshotted against generation N stays executable while
    // generation N+1 commits
    private var retired: Seq[DataFrame] = Nil

    private[graft] def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return // redelivered micro-batch: no-op
      val bs = TextQueries.decontLangStats(TextQueries.docShingles(batch), heldSh)
      val next = stats.map(_.unionByName(bs)).getOrElse(bs)
        .groupBy(col("lang"))
        .agg(sum(col("n_train")).as("n_train"),
          sum(col("n_dropped")).as("n_dropped"),
          sum(col("tokens_dropped")).as("tokens_dropped"),
          sum(col("tokens_clean")).as("tokens_clean"))
        .localCheckpoint()
      stateDir.foreach(d => BatchStateStore.commit(s, d,
        Seq("stats" -> next, "heldfp" -> heldFp), batchId))
      retired.foreach(_.unpersist())
      retired = stats.toSeq
      stats = Some(next)
      lastBatchId = batchId
    }

    /** The t44 report as of the last completed micro-batch. Snapshots the
      * state under the merge lock (no job runs while holding it). */
    def report: DataFrame = synchronized { stats } match {
      case Some(st) => st.orderBy(col("lang"))
      case None => s.emptyDataFrame
    }

    /** The last folded micro-batch id. */
    def lastCommittedBatch: Long = synchronized { lastBatchId }

    private[graft] def rehydrate(saved: DataFrame, savedBatchId: Long): Unit =
      synchronized {
        require(stats.isEmpty, "rehydrate must run on a fresh state")
        stats = Some(saved.localCheckpoint())
        lastBatchId = savedBatchId
      }
  }

  /** Order-free fingerprint of a heldout shingle-key set: (count, bit-xor
    * of keys) — one row, enough to catch a restart against a different
    * benchmark set (both stats collide only if two sets agree on size AND
    * xor-sum over 64-bit hashes). */
  private def heldFingerprint(heldSh: DataFrame): DataFrame =
    heldSh.agg(count(lit(1)).as("n"), coalesce(bit_xor(col("g")), lit(0L)).as("x"))

  private def heldShOf(heldout: DataFrame): DataFrame = {
    require(!heldout.isStreaming,
      "the heldout benchmark set is static input — pass a batch DataFrame")
    TextQueries.docShingles(heldout)
      .select(explode(col("gs")).as("g")).distinct()
      .localCheckpoint() // static: built once, probed by every batch
  }

  /** Rehydrate a [[DecontState]] from a `stateDir` written by a previous
    * run — in any SparkSession ([[StreamIngest.load]]'s contract). Fails
    * loudly if `heldout` is not the set the persisted fold was built
    * against. */
  def load(s: SparkSession, heldout: DataFrame, stateDir: String): DecontState = {
    val heldSh = heldShOf(heldout)
    val st = new DecontState(s, Some(stateDir), heldSh)
    BatchStateStore.committedBatch(s, stateDir).foreach { bid =>
      val fpSaved = BatchStateStore.table(s, stateDir, "heldfp", bid).head()
      val fpNow = heldFingerprint(heldSh).head()
      require(fpSaved == fpNow,
        s"stateDir $stateDir was folded against a different heldout set " +
          s"(saved n=${fpSaved.getLong(0)} xor=${fpSaved.getLong(1)}, " +
          s"given n=${fpNow.getLong(0)} xor=${fpNow.getLong(1)}); " +
          "decontamination decisions are benchmark-specific — use a fresh stateDir")
      st.rehydrate(BatchStateStore.table(s, stateDir, "stats", bid), bid)
    }
    st
  }

  /** THE FRONT DOOR — durable by default: state persists to `stateDir`
    * per batch and the same call rehydrates it on restart. `train` is the
    * streaming (doc_id, text, lang) corpus; `heldout` the static
    * benchmark frame of the same shape. */
  def start(train: DataFrame, heldout: DataFrame, checkpoint: String,
      stateDir: String): (StreamingQuery, DecontState) =
    startWith(train, checkpoint, load(train.sparkSession, heldout, stateDir))

  /** DEMO/TEST overload — ephemeral state, lost with the session. */
  def startEphemeral(train: DataFrame, heldout: DataFrame,
      checkpoint: String): (StreamingQuery, DecontState) =
    startWith(train, checkpoint,
      new DecontState(train.sparkSession, None, heldShOf(heldout)))

  private def startWith(train: DataFrame, checkpoint: String,
      state: DecontState): (StreamingQuery, DecontState) = {
    require(train.isStreaming, "StreamDecontaminate.start needs a streaming DataFrame")
    val q = train.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) => state.merge(batch, id) }
      .start()
    (q, state)
  }
}
