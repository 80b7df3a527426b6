package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler (not part of the driver contract): runs the
  * named queries exactly as Bench does (same session conf, noop sink, one
  * untimed warmup + timed run) and reports, per query: wall seconds, job
  * count, stage count, task count, summed executor task time, and summed
  * shuffle bytes — the breakdown that tells fixed scheduling overhead apart
  * from real work.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Profile q1,q2,...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SessionConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    // A/B experiment confs: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())

    object M {
      @volatile var jobs = 0
      @volatile var stages = 0
      @volatile var tasks = 0
      @volatile var taskTimeMs = 0L
      @volatile var shufWrite = 0L
      @volatile var shufRead = 0L
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; shufWrite = 0L; shufRead = 0L }
    }
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = M.jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        M.stages += 1
        M.tasks += s.stageInfo.numTasks
        M.taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
        M.shufWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        M.shufRead += s.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead +
          s.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else SparkEntry.allDefs.filter(_.benchmark).map(_.name)
    println(f"${"query"}%-34s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s ${"shufMB"}%8s")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      // warmup (untimed)
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      System.gc()
      spark.catalog.clearCache()
      Thread.sleep(300) // let the listener bus drain before resetting counters
      M.reset()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$n%-34s $sec%7.3f ${M.jobs}%5d ${M.stages}%6d ${M.tasks}%6d ${M.taskTimeMs / 1000.0}%8.2f ${(M.shufWrite + M.shufRead) / 1e6}%8.2f")
    }
    spark.stop()
  }
}
