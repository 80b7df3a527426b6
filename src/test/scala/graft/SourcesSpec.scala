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

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val src = Tables.supplier(spark, sf)
    src.write.mode("overwrite").orc(s"$tmp/supplier_orc")
    val back = spark.read.orc(s"$tmp/supplier_orc")
    assert(back.orderBy($"s_suppkey").collect().toSeq ===
      src.orderBy($"s_suppkey").collect().toSeq)
    // ORC scans take predicate pushdown like parquet — the 100 TB contract
    val filtered = back.filter($"s_suppkey" <= 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(s_suppkey), LessThanOrEqual(s_suppkey,10)"), plan)
  }

  test("binaryFile source ingests raw files with path metadata") {
    // the production ingest path for multimodal assets (Multimodal.scala):
    // each file becomes (path, modificationTime, length, content)
    val dir = Files.createDirectory(java.nio.file.Paths.get(tmp, "blobs"))
    val payloads = Map("a.bin" -> "alpha", "b.bin" -> "bravo-longer")
    payloads.foreach { case (name, body) =>
      Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    }
    val df = spark.read.format("binaryFile").load(s"$tmp/blobs")
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val got = df.select(regexp_extract($"path", "([^/]+)$", 1).as("name"), $"length", $"content")
      .as[(String, Long, Array[Byte])].collect()
      .map(r => r._1 -> (r._2, new String(r._3, "UTF-8"))).toMap
    assert(got === payloads.map { case (n, b) => n -> (b.length.toLong, b) })
    // pathGlobFilter prunes at listing time — no bytes read for excluded files
    val onlyA = spark.read.format("binaryFile")
      .option("pathGlobFilter", "a.*").load(s"$tmp/blobs")
    assert(onlyA.count() === 1L)
  }

  test("key-clustered sorted write: row-group stats prune the scan, file sizes bounded") {
    // Writer-side data layout — the other half of the 100 TB read story:
    // range-partition + sort by the hot filter key so every file covers a
    // narrow key band, and parquet min/max stats let a point-range filter
    // skip whole row groups. The same filter over a key-shuffled layout
    // must materialize (roughly) every row; over the clustered layout the
    // scan's OUTPUT row count collapses to the surviving band.
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // executes THIS df's plan, so its scan metrics populate
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_extendedprice")
    val total = li.count()
    li.repartitionByRange(8, $"l_orderkey").sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").option("maxRecordsPerFile", "1000")
      .parquet(s"$tmp/li_clustered")
    // deterministic shuffle: order by a hash so key ranges smear across files
    li.repartition(8, xxhash64($"l_orderkey", $"l_extendedprice"))
      .write.mode("overwrite").option("maxRecordsPerFile", "1000")
      .parquet(s"$tmp/li_shuffled")
    val hot = $"l_orderkey" <= 100 // a narrow band of the key domain
    val clustered = scanRows(spark.read.parquet(s"$tmp/li_clustered").filter(hot))
    val shuffled = scanRows(spark.read.parquet(s"$tmp/li_shuffled").filter(hot))
    assert(clustered < total / 4,
      s"clustered layout should skip most row groups: scanned $clustered of $total")
    assert(clustered < shuffled,
      s"clustered scan ($clustered rows) must beat shuffled ($shuffled rows)")
    // maxRecordsPerFile actually bounds files (layout stays compaction-friendly)
    val files = new java.io.File(s"$tmp/li_clustered").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "expected multiple bounded files")
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 1000L, s"${f.getName} exceeds maxRecordsPerFile: $n")
    }
  }
}
