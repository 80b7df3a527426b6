package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY.md §2.2 joins / partitioning): writing
  * both fact tables bucketed by the join key lets the join run
  * shuffle-free — the key 100 TB technique for repeated fact-fact joins. */
class BucketingSpec extends SparkSpec {

  test("join over tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    // warehouse.dir is a static conf — use the default (./spark-warehouse,
    // gitignored) and clean the database up afterwards
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bucket_test")
    spark.sql("USE graft_bucket_test")
    try {
      Tables.lineitem(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan feeds SortMergeJoin with no Exchange below the join
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"co-located join still shuffles:\n$plan")
      // and it computes the right answer
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP DATABASE IF EXISTS graft_bucket_test CASCADE")
    }
  }
}
