package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.util.QueryExecutionListener

/** The StreamIngestPlanSpec no-collect gate, generalized over the
  * foreachBatch twin registry (the round-6 verdict's stretch 7): round 5's
  * regression class was a driver-side `collect()` of per-batch data baked
  * back into a plan as an `isin` literal list — O(batch) through the
  * driver and an O(n)-literal Catalyst expression. This spec drives each
  * fold twin through its public streaming API over batches big enough
  * that any collected id list would be unmistakable (150+ rows vs the
  * 16-literal enum allowance), tracing every driver action the fold
  * executes, and asserts the class is structurally absent EVERYWHERE:
  *
  *  1. the only materializing action a fold may run is its per-batch
  *     `localCheckpoint` (lineage truncation) — no collect/head/take/
  *     toLocalIterator ever reaches the driver from inside a merge;
  *  2. no traced plan contains an In/InSet wider than a small constant
  *     enum (tombstone-type lists and the like pass; a data-derived id
  *     list cannot).
  *
  * StreamIngest's own mining seam keeps its dedicated semi-join gate in
  * StreamIngestPlanSpec; this registry covers EVERY other foreachBatch
  * twin. (The StreamFsm-engine twins — StreamOccupancy, StreamEwma,
  * StreamQuota, StreamCusum — and the transformWithState dedup twins hold
  * their state in the streaming state store and execute no driver-side
  * per-batch plan at all, so the collect-and-isin class cannot occur
  * there by construction; they are gated by their stream≡batch
  * equivalence tests instead.)
  *
  * Most twins may run ONLY localCheckpoint; a twin whose designed state
  * is a driver-resident bounded sketch (StreamHeavyHitters' ≤k
  * Misra–Gries summary) additionally folds through a 1-row `head` and a
  * scalar `count` — bounded by k and 1 respectively, never O(batch). */
class StreamTwinPlanSpec extends SparkSpec {

  import spark.implicits._

  private val MaxEnumLiterals = 16
  private val AllowedActions = Set("localCheckpoint")
  private val BoundedSketchActions = AllowedActions ++ Set("head", "count")
  /** StreamSemanticDecontaminate's construction derives its LSH geometry
    * from the STATIC heldout set — one scalar `count` at state build,
    * never per batch (the drive below spans one construction + two
    * batches, so a per-batch count would trace twice and fail). */
  private val StaticGeometryActions = AllowedActions ++ Set("count")
  /** StreamDecontaminateApply is a SINK gate: its designed per-batch
    * action is the idempotent parquet write of the kept slice (traced as
    * `command`, plus the construction-time geometry count) — still no
    * collect class. */
  private val SinkGateActions = StaticGeometryActions ++ Set("command")

  /** Run `drive`, returning every (action name, query execution) the
    * session's driver executed while it ran. */
  private def traced(drive: => Unit): Seq[(String, QueryExecution)] = {
    val acts = new ConcurrentLinkedQueue[(String, QueryExecution)]()
    val ql = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        acts.add((f, qe))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
        acts.add((f, qe))
    }
    spark.listenerManager.register(ql)
    try { drive; Thread.sleep(800) } // drain the async listener bus
    finally spark.listenerManager.unregister(ql)
    import scala.jdk.CollectionConverters._
    acts.asScala.toSeq
  }

  private def wideIns(qe: QueryExecution): Seq[String] =
    qe.optimizedPlan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case i: In if i.list.size > MaxEnumLiterals => s"In(${i.list.size})"
        case i: InSet if i.hset.size > MaxEnumLiterals => s"InSet(${i.hset.size})"
      })
    }.flatten

  private def ts(i: Int) =
    java.sql.Timestamp.valueOf(f"2024-03-01 ${i / 60}%02d:${i % 60}%02d:00")

  /** Twin registry: name -> (allowed driver actions, drive) — start on a
    * MemoryStream, feed two 150-row batches, stop. 150 distinct ids per
    * batch means a collected id list re-entering a plan would be a
    * 150-wide In — 9x the enum allowance. */
  private lazy val twins: Seq[(String, Set[String], () => Unit)] = Seq(
    ("StreamCdc", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val rows = (0 until 300).map(i => (i.toLong, ts(i), (i % 40).toLong,
        Seq("signup", "view", "delete")(i % 3), i.toDouble))
      val (q, state) = graft.streaming.StreamCdc.start(
        ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.snapshot.columns.nonEmpty)
    }),
    ("StreamSample", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      val rows = (0 until 300).map(i => (i.toLong, Seq("en", "de", "fr")(i % 3)))
      val (q, state) = graft.streaming.StreamSample.start(
        ms.toDF().toDF("doc_id", "lang"), k = 7)
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.sample.columns.nonEmpty)
    }),
    ("StreamScd2", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val rows = (0 until 300).map(i => (i.toLong, ts(i), (i % 40).toLong,
        s"""{"k": ${(i / 40) * 25}}"""))
      val (q, state) = graft.streaming.StreamScd2.start(
        ms.toDF().toDF("event_id", "ts", "user_id", "props"))
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.history.columns.nonEmpty)
    }),
    ("StreamDomainGovernance", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      val rows = (0 until 300).map(i =>
        (i.toLong, s"https://d${i % 25}.com/p/${i % 60}"))
      val ckpt = java.nio.file.Files.createTempDirectory("gov_gate").toString
      val (q, state) = graft.streaming.StreamDomainGovernance.startEphemeral(
        ms.toDF().toDF("doc_id", "url"), ckpt)
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.report.columns.nonEmpty)
    }),
    ("StreamDecontaminate", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, String, String)]
      def txt(i: Int) = (0 until 12).map(j => s"w${(i * 7 + j) % 90}").mkString(" ")
      val rows = (0 until 300).map(i =>
        (100L + i, txt(i), Seq("en", "de", "fr")(i % 3)))
      val heldout = (0 until 40).map(i => (i.toLong, txt(i * 3), "en"))
        .toDF("doc_id", "text", "lang")
      val ckpt = java.nio.file.Files.createTempDirectory("decont_gate").toString
      val (q, state) = graft.streaming.StreamDecontaminate.startEphemeral(
        ms.toDF().toDF("doc_id", "text", "lang"), heldout, ckpt)
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.report.columns.nonEmpty)
    }),
    ("StreamClusterLabels", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, Long)]
      // 300 chain pairs over 170 ids: components merge across batches
      val rows = (0 until 300).map(i => ((i * 13 % 170).toLong, (i * 7 % 170).toLong))
        .filter { case (a, b) => a != b }
      val ckpt = java.nio.file.Files.createTempDirectory("clabels_gate").toString
      val (q, state) = graft.streaming.StreamClusterLabels.startEphemeral(
        ms.toDF().toDF("doc_a", "doc_b"), ckpt)
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.snapshot.columns.nonEmpty)
    }),
    ("StreamSemanticDecontaminate", StaticGeometryActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, String, String, Array[Float])]
      def vv(i: Int) = Array.tabulate(64)(j => ((i * 31 + j) % 7 - 3).toFloat)
      val rows = (0 until 300).map(i =>
        (100L + i, s"doc number $i", Seq("en", "de", "fr")(i % 3), vv(i)))
      val heldout = (0 until 40).map(i => (i.toLong, s"held $i", "en", vv(i * 3)))
        .toDF("doc_id", "text", "lang", "embedding")
      val ckpt = java.nio.file.Files.createTempDirectory("semdecont_gate").toString
      val (q, state) = graft.streaming.StreamSemanticDecontaminate.startEphemeral(
        ms.toDF().toDF("doc_id", "text", "lang", "embedding"), heldout, ckpt)
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.report.columns.nonEmpty)
    }),
    ("StreamDecontaminateApply", SinkGateActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, String, String, Array[Float])]
      def vv(i: Int) = Array.tabulate(64)(j => ((i * 31 + j) % 7 - 3).toFloat)
      def txt(i: Int) = (0 until 12).map(j => s"w${(i * 7 + j) % 90}").mkString(" ")
      val rows = (0 until 300).map(i =>
        (100L + i, txt(i), Seq("en", "de", "fr")(i % 3), vv(i)))
      val heldout = (0 until 40).map(i => (i.toLong, txt(i * 3), "en", vv(i * 3)))
        .toDF("doc_id", "text", "lang", "embedding")
      val work = java.nio.file.Files.createTempDirectory("apply_gate").toString
      val q = graft.streaming.StreamDecontaminateApply.start(
        ms.toDF().toDF("doc_id", "text", "lang", "embedding"), heldout,
        s"$work/ckpt", s"$work/out")
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(graft.streaming.StreamDecontaminateApply.kept(spark, s"$work/out")
        .columns.nonEmpty)
    }),
    ("StreamAdmission", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      def txt(i: Int) = (0 until 30).map(j => s"w${(i * 11 + j) % 400}").mkString(" ")
      val rows = (0 until 300).map(i => (i.toLong, txt(i)))
      val (q, state) = graft.streaming.StreamAdmission.start(
        ms.toDF().toDF("doc_id", "text"))
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.admitted.columns.nonEmpty)
    }),
    ("StreamQuantiles", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[Long]
      val rows = (0 until 300).map(i => ((i * 37) % 1000).toLong)
      val (q, state) = graft.streaming.StreamQuantiles.start(
        ms.toDF().toDF("c"))
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.quantiles(Seq(0.5)).columns.nonEmpty)
    }),
    ("StreamRollingDistinct", AllowedActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[(java.sql.Timestamp, Long)]
      val rows = (0 until 300).map(i => (ts(i), (i * 13 % 170).toLong))
      val (q, state) = graft.streaming.StreamRollingDistinct.start(
        ms.toDF().toDF("ts", "user_id"))
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.daySketches.columns.nonEmpty)
    }),
    ("StreamHeavyHitters", BoundedSketchActions, { () =>
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[Long]
      val rows = (0 until 300).map(i => (i % 170).toLong)
      val (q, state) = graft.streaming.StreamHeavyHitters.start(
        ms.toDF().toDF("key"), k = 9)
      try rows.grouped(150).foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      finally q.stop()
      assert(state.total === 300L)
    }))

  for ((name, allowed, drive) <- twins)
    test(s"$name folds collect-free: only bounded driver actions, no data-derived In/InSet") {
      val acts = traced(drive())
      assert(acts.nonEmpty, "the drive must execute at least one fold action")
      val illegal = acts.map(_._1).filterNot(allowed)
      assert(illegal.isEmpty,
        s"$name ran driver actions beyond its allowance: " +
          illegal.groupBy(identity).view.mapValues(_.size).toMap)
      // the static-geometry allowance is construction-only: the drive spans
      // one state build + two batches, so a per-batch count would trace >1
      if (allowed == StaticGeometryActions || allowed == SinkGateActions)
        assert(acts.count(_._1 == "count") <= 1,
          s"$name must derive geometry once at construction, not per batch")
      val ins = acts.flatMap { case (f, qe) => wideIns(qe).map(w => s"$f: $w") }
      assert(ins.isEmpty,
        s"$name bakes a data-derived literal list into a plan: ${ins.mkString(", ")}")
    }
}
