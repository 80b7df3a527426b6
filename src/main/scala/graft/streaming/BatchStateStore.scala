package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch parquet persistence with an atomically-renamed `_latest`
  * commit marker — the transactional-table discipline shared by the
  * foreachBatch fold states ([[StreamIngest.IngestState]],
  * [[StreamIngestTws.TwsIngestState]]): each committed micro-batch writes
  * its full table set under batch-suffixed dirs, then moves the marker.
  * A crash anywhere before the rename leaves the previous commit
  * readable, and the source checkpoint redelivers the uncommitted batch,
  * which re-folds idempotently. Production swaps the parquet-overwrite
  * for a Delta/Iceberg MERGE; the commit protocol is the same. */
private[graft] object BatchStateStore {

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Commit `tables` (name -> frame) for `batchId`, then prune older
    * batches' tables — only AFTER the marker moves, so the committed state
    * is readable at every instant. */
  def commit(s: SparkSession, dir: String, tables: Seq[(String, DataFrame)],
      batchId: Long): Unit = {
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/${n}_$batchId")
    }
    val fs = fsOf(s, new Path(dir))
    val latest = new Path(dir, "_latest")
    val tmp = new Path(dir, "_latest.tmp")
    // Written once, right BEFORE the first marker rename: its absence
    // later proves no commit ever reached the rename (first-commit crash,
    // safe to rehydrate fresh); its presence with no _latest marks
    // possible marker loss over committed state (fail loudly). Sentinel-
    // before-rename makes the one crash window FAIL-SAFE: a crash between
    // the sentinel write and the first rename turns into a loud false
    // positive on recoverable state (the operator resolves it) rather
    // than the sentinel-after-rename ordering's silent fresh rehydrate
    // over a committed batch (the round-8 advisory). See committedBatch.
    val once = new Path(dir, "_committed_once")
    if (!fs.exists(once)) fs.create(once, true).close()
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    // Atomic OVERWRITE rename (FileContext, not FileSystem.rename): a
    // delete-then-rename would open a window where a crash leaves NO
    // marker at all — committedBatch() would then silently start fresh
    // while the query checkpoint never redelivers the committed batches.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      latest.toUri, s.sparkContext.hadoopConfiguration)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(latest),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    val prefixes = tables.map(_._1 + "_")
    fs.listStatus(new Path(dir)).foreach { st =>
      val nm = st.getPath.getName
      val pfx = prefixes.find(nm.startsWith)
      if (pfx.exists(p => nm.substring(p.length) != batchId.toString))
        fs.delete(st.getPath, true)
    }
  }

  /** The committed batch id in `dir`, if any commit completed.
    *
    * Defense-in-depth: a dir that holds completed table dirs but NO
    * marker is either a crash during the FIRST commit (table parquet
    * landed, marker never created; a fresh state is correct because the
    * source checkpoint still redelivers that batch) or marker loss over
    * committed state (a fresh state would silently drop batches the
    * checkpoint will never redeliver). The `_committed_once` sentinel —
    * created right before the first marker rename, never removed —
    * disambiguates: absent, the common benign case self-heals (return
    * None, redelivery re-folds batch 0); present with no `_latest`, the
    * possibly-unrecoverable case fails loudly and the operator resolves
    * it (a crash between the sentinel write and the first rename also
    * lands here — a deliberate loud false positive on recoverable
    * state, never a silent loss). */
  def committedBatch(s: SparkSession, dir: String): Option[Long] = {
    val latest = new Path(dir, "_latest")
    val fs = fsOf(s, latest)
    if (!fs.exists(latest)) {
      if (fs.exists(new Path(dir, "_committed_once")))
        throw new IllegalStateException(
          s"state dir $dir committed at least one batch but has no _latest " +
            "marker; refusing to rehydrate a fresh state over committed batches")
      None
    }
    else {
      val in = fs.open(latest)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Read table `name` of the committed batch. */
  def table(s: SparkSession, dir: String, name: String, batchId: Long): DataFrame =
    s.read.parquet(s"$dir/${name}_$batchId")
}
