package graft

/** Ad-hoc plan inspection main (not part of the driver contract): prints
  * the executed plan of the named queries — used to audit new operators'
  * plan shape beyond what PlanQualitySpec gates. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSeq
      else Seq("q38_sql_api", "q37_array_functions", "d07_dedup_keep_canonical")
    names.foreach { n =>
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString.take(2500))
    }
    spark.stop()
  }
}
