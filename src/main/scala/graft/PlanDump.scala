package graft

/** Optimization-round plan capture (not part of the driver contract):
  * writes `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<tag>.txt`, using the SAME session configuration as
  * Bench (master local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus, AQE
  * on) so the captured plans are the plans the bench actually runs.
  *
  * Usage: runMain graft.PlanDump <names|all> <sfDir> <outDir> <tag>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty && args(0) != "all") args(0).split(",").toSeq
      else SparkEntry.allDefs.filter(_.benchmark).map(_.name)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = new java.io.File(if (args.length > 2) args(2) else "plans/r09")
    val tag = if (args.length > 3) args(3) else "before"
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionConf.common(org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(new java.io.File(outDir, s"${n}_$tag.txt"), "UTF-8")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote ${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
