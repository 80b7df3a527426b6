package graft

import org.apache.spark.sql.SparkSession

/** Round-telemetry probe for the iterative dedup/cluster family: runs one
  * clusterLabels-backed query (default s11_semantic_clusters) end-to-end
  * on a fixture dir and prints ONE JSON line with the label-propagation
  * round count and per-round frontier (changed-label counts — the
  * Observation side-metric [[graft.operators.DedupQueries.clusterLabels]]
  * collects every round). This is the measured rounds-vs-data-size curve
  * a 100 TB capacity plan needs: rounds grow with log(component
  * diameter), so the probe at sf0.1 vs the sf1 replica shows whether
  * bigger corpora mean more rounds (they shouldn't, until component
  * structure changes) — recorded in bench/sf1_probe.json.
  *
  * Drive: `runMain graft.ClusterRoundsProbe [sfDir [queryName]]`.
  */
object ClusterRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.drop(1).headOption.getOrElse("s11_semantic_clusters")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val frontier = graft.operators.DedupQueries.lastClusterFrontier.get()
    println(f"""{"query":"$name","sf":"$sfDir","sec":$sec%.3f,""" +
      s""""rounds":${frontier.length},"frontier":[${frontier.mkString(",")}]}""")
    spark.stop()
  }
}
