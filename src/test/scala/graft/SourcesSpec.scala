package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY.md §2.2 scans/sources/sinks): CSV and JSON
  * round-trips preserve the parquet-sourced data; partitioned parquet write
  * prunes on read. */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  test("CSV round-trip preserves rows and values") {
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$tmp/nation_csv")
    assert(back.count() === src.count())
    assert(back.orderBy($"n_nationkey").collect().toSeq ===
      src.orderBy($"n_nationkey").collect().toSeq)
  }

  test("JSON round-trip preserves rows and values") {
    val src = Tables.customer(spark, sf)
    src.write.mode("overwrite").json(s"$tmp/customer_json")
    val back = spark.read.schema(src.schema).json(s"$tmp/customer_json")
    assert(back.count() === src.count())
    assert(back.orderBy($"c_custkey").collect().toSeq ===
      src.orderBy($"c_custkey").collect().toSeq)
  }

  test("partitioned parquet write enables partition pruning on read") {
    Tables.orders(spark, sf)
      .withColumn("status", $"o_orderstatus")
      .write.mode("overwrite").partitionBy("status").parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part").filter($"status" === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan)
    val expected = Tables.orders(spark, sf).filter($"o_orderstatus" === "F").count()
    assert(pruned.count() === expected)
  }
}
