package graft.streaming

import graft.operators.TextQueries
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The t42 URL/domain governance gate as a live foreachBatch twin: fold
  * the crawl stream's canonical-URL universe incrementally and keep the
  * per-domain cap report current, such that after any prefix of the
  * stream [[GovState.report]] equals
  * [[TextQueries.domainGovernance]] over the same prefix (StreamingSpec
  * asserts this across micro-batch splits and a restart).
  *
  * Fold state is two monoids, so the result is split-invariant by
  * construction:
  *   - `urls` — the DISTINCT (canonical url, domain) set (set union;
  *     canonicalization is per-row, so a URL's key never depends on
  *     arrival order);
  *   - `counts` — per-domain raw doc counts (sum), kept separately
  *     because the report's n_docs counts every fetch, including
  *     canonical dups the set absorbs.
  * Per batch the cap decision ([[TextQueries.domainCapReport]], t41's
  * waterfill at unit weight) recomputes from the folded aggregates — an
  * O(domains) computation, never a corpus re-aggregation. State size is
  * O(distinct canonical urls + domains), never O(stream length).
  *
  * Durable by default ([[StreamIngest.start]]'s contract): the front-door
  * [[start]] requires a `stateDir`, persists both tables per committed
  * batch through [[BatchStateStore]], and the SAME call rehydrates them
  * on restart — first start and restart are one code path. */
object StreamDomainGovernance {

  final class GovState(s: SparkSession, stateDir: Option[String],
      budgetPct: Long) {

    @volatile private var urls: Option[DataFrame] = None   // (curl, domain) distinct
    @volatile private var counts: Option[DataFrame] = None // (domain, n_docs)
    @volatile private var lastBatchId: Long = -1L
    // Unpersist is deferred by ONE generation: a concurrent report that
    // snapshotted generation N under the lock stays executable while
    // generation N+1 commits (localCheckpointed frames cannot recompute
    // once their blocks are dropped). Only generation N-1 is reclaimed.
    private var retired: Seq[DataFrame] = Nil

    private[graft] def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return // redelivered micro-batch: no-op
      val canon = TextQueries.canonicalUrls(batch)
      val nextUrls = urls.map(_.unionByName(canon)).getOrElse(canon)
        .distinct().localCheckpoint()
      val batchCounts = canon.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"))
      val nextCounts = counts.map(_.unionByName(batchCounts)).getOrElse(batchCounts)
        .groupBy(col("domain")).agg(sum(col("n_docs")).as("n_docs"))
        .localCheckpoint()
      stateDir.foreach(d => BatchStateStore.commit(s, d,
        Seq("urls" -> nextUrls, "counts" -> nextCounts), batchId))
      retired.foreach(_.unpersist())
      retired = (urls.toSeq ++ counts.toSeq)
      urls = Some(nextUrls)
      counts = Some(nextCounts)
      lastBatchId = batchId
    }

    /** The t42 cap report as of the last completed micro-batch.
      *
      * Takes the same lock [[merge]] holds: a live monitoring read that
      * raced an active micro-batch could otherwise pair batch-N urls with
      * batch-N+1 counts, or reference a just-unpersisted localCheckpointed
      * frame whose blocks are already gone. The lock is only held long
      * enough to snapshot the two frame handles and the budget plan
      * (lazy, no job runs under the lock). */
    def report: DataFrame = synchronized { (urls, counts) } match {
      case (Some(u), Some(c)) =>
        val dom = u.groupBy(col("domain"))
          .agg(countDistinct(col("curl")).as("n_urls"))
          .join(c, Seq("domain"))
          .select(col("domain"), col("n_docs"), col("n_urls"))
        TextQueries.domainCapReport(dom, budgetPct)
      case _ => s.emptyDataFrame
    }

    /** The last folded micro-batch id. */
    def lastCommittedBatch: Long = synchronized { lastBatchId }

    private[graft] def rehydrate(savedUrls: DataFrame, savedCounts: DataFrame,
        savedBatchId: Long): Unit = synchronized {
      require(urls.isEmpty, "rehydrate must run on a fresh state")
      urls = Some(savedUrls.localCheckpoint())
      counts = Some(savedCounts.localCheckpoint())
      lastBatchId = savedBatchId
    }
  }

  /** Rehydrate a [[GovState]] from a `stateDir` written by a previous run
    * — in any SparkSession ([[StreamIngest.load]]'s contract). */
  def load(s: SparkSession, stateDir: String,
      budgetPct: Long = TextQueries.DomainBudgetPct): GovState = {
    val st = new GovState(s, Some(stateDir), budgetPct)
    BatchStateStore.committedBatch(s, stateDir).foreach { bid =>
      st.rehydrate(BatchStateStore.table(s, stateDir, "urls", bid),
        BatchStateStore.table(s, stateDir, "counts", bid), bid)
    }
    st
  }

  /** THE FRONT DOOR — durable by default: state persists to `stateDir`
    * per batch and the same call rehydrates it on restart. */
  def start(urls: DataFrame, checkpoint: String, stateDir: String,
      budgetPct: Long = TextQueries.DomainBudgetPct): (StreamingQuery, GovState) =
    startWith(urls, checkpoint, load(urls.sparkSession, stateDir, budgetPct))

  /** DEMO/TEST overload — ephemeral state, lost with the session. */
  def startEphemeral(urls: DataFrame, checkpoint: String,
      budgetPct: Long = TextQueries.DomainBudgetPct): (StreamingQuery, GovState) =
    startWith(urls, checkpoint, new GovState(urls.sparkSession, None, budgetPct))

  private def startWith(urls: DataFrame, checkpoint: String,
      state: GovState): (StreamingQuery, GovState) = {
    require(urls.isStreaming, "StreamDomainGovernance.start needs a streaming DataFrame")
    val q = urls.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) => state.merge(batch, id) }
      .start()
    (q, state)
  }
}
