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

  test("Avro round-trip preserves rows and values") {
    // The avro reader/writer classes ship inside spark-sql 4.1
    // (org.apache.spark.sql.avro) but this deployment lacks the separate
    // spark-avro module's service registration, so the library registers
    // AvroFileFormat itself (src/main/resources/META-INF/services) — that
    // is what makes the "avro" short name resolve here.
    // Avro is a row format: no column stats, so no pushed-filter gate here
    // (that contract belongs to parquet/ORC); correctness + partition
    // pruning on the directory layout is the Avro-side scale story.
    val src = Tables.part(spark, sf)
    src.write.mode("overwrite").format("avro").save(s"$tmp/part_avro")
    val back = spark.read.format("avro").load(s"$tmp/part_avro")
    assert(back.schema === src.schema)
    assert(back.orderBy($"p_partkey").collect().toSeq ===
      src.orderBy($"p_partkey").collect().toSeq)
    // partitioned avro write still prunes at listing time
    src.withColumn("brand", $"p_brand")
      .write.mode("overwrite").format("avro").partitionBy("brand")
      .save(s"$tmp/part_avro_part")
    val one = spark.read.format("avro").load(s"$tmp/part_avro_part")
      .filter($"brand" === "Brand#11")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(brand"), plan)
    assert(one.count() === src.filter($"p_brand" === "Brand#11").count())
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

  test("events loader adapts to every ts encoding the driver has shipped (fixture-drift guard)") {
    // Round 3 post-mortem: the driver regenerated fixtures with events.ts as
    // timestamp[us] while the loader assumed nanos-as-long — 13 queries died
    // at analysis time. This guard writes events-shaped parquet in all three
    // Spark-visible encodings and asserts Tables.events normalizes each to
    // the same session-zone TimestampType values, so the next fixture
    // regeneration cannot silently kill a family of queries again.
    import org.apache.spark.sql.types._
    val micros = Seq(1700000000000000L, 1700000123456789L, 1712345678901234L)
    def writeEnc(sub: String)(col: org.apache.spark.sql.Column): String = {
      val dir = s"$tmp/$sub"
      micros.toDF("us").select(col.as("ts"), $"us".as("event_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // (1) nanos-since-epoch long — the Spark-visible shape of the round-1/2
    //     TIMESTAMP(NANOS) fixtures under spark.sql.legacy.parquet.nanosAsLong
    val nanosDir = writeEnc("ev_nanos")($"us" * 1000L)
    // (2) timestamp[us] without UTC adjustment → loads as TIMESTAMP_NTZ
    //     (the round-3 regenerated fixtures)
    val ntzDir = writeEnc("ev_ntz")(timestamp_micros($"us").cast(TimestampNTZType))
    // (3) UTC-adjusted micros → loads as session-zone TimestampType directly
    val ltzDir = writeEnc("ev_ltz")(timestamp_micros($"us"))
    val loaded = Seq(nanosDir, ntzDir, ltzDir).map { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType === TimestampType,
        s"$d: loader must normalize ts to session-zone TimestampType")
      df.select(unix_micros($"ts"), date_trunc("hour", $"ts").cast("string"))
        .orderBy($"event_id").as[(Long, String)].collect().toSeq
    }
    assert(loaded(0).map(_._1) === micros, "nanos encoding: exact micros truncation")
    assert(loaded.distinct.size === 1,
      s"all encodings must load identically, got: $loaded")
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

  test("parquet schema evolution: mergeSchema unions batch schemas, old rows null-fill") {
    // long-lived datasets accrete columns batch by batch; the reader must
    // see the union schema with absent columns null-filled, or every schema
    // change forces a full rewrite of 100 TB of history
    val dir = s"$tmp/evolving"
    Seq((1L, "a")).toDF("id", "v1").write.mode("overwrite").parquet(s"$dir/b=1")
    Seq((2L, "b", 42L)).toDF("id", "v1", "v2").write.mode("overwrite").parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1", "v2", "b"))
    val rows = merged.orderBy($"id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")), "old batch must null-fill new column")
    assert(rows(1).getLong(rows(1).fieldIndex("v2")) === 42L)
  }

  test("corrupt-record handling: PERMISSIVE quarantines bad JSON rows instead of failing") {
    // ingest robustness: a 100 TB crawl WILL contain malformed records; the
    // pipeline must keep them inspectable (corrupt-record column), not die
    // (FAILFAST) or silently drop them
    val dir = Files.createDirectory(java.nio.file.Paths.get(tmp, "dirty_json"))
    Files.write(dir.resolve("data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 "v": "missing comma"}
        |{"id": 3, "v": "fine"}
        |""".stripMargin.getBytes("UTF-8"))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache() // corrupt-record column needs the raw row retained
    assert(df.filter($"_corrupt_record".isNull).count() === 2L)
    val bad = df.filter($"_corrupt_record".isNotNull).collect()
    assert(bad.length === 1 && bad.head.getString(2).contains("missing comma"))
    df.unpersist()
  }

  test("Observation API: pipeline telemetry rides the job, no second scan") {
    // production pipelines need admission counters (rows in, rows kept,
    // bytes) WITHOUT re-running the query; observe() attaches an aggregate
    // to the existing plan and delivers it with the job's completion —
    // at 100 TB this is the difference between free telemetry and a
    // second full scan for a count
    import org.apache.spark.sql.Observation
    import spark.implicits._
    val obs = Observation("admission")
    val docs = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(($"n_chars" >= 100L).cast("long")).as("rows_kept"),
        sum($"n_chars").as("chars_in"))
      .filter($"n_chars" >= 100L)
    val kept = docs.count()
    val m = obs.get
    assert(m("rows_kept") == kept)
    assert(m("rows_in").asInstanceOf[Long] >= kept)
    assert(m("chars_in").asInstanceOf[Long] > 0L)
  }

  test("stream-source seam: kafka branch builds the full reader contract, broker-free") {
    import graft.streaming.{KafkaStreamSource, StreamSource}
    // production config: the R12 bounded-channel cap must surface as
    // maxOffsetsPerTrigger, topics as one subscribe list — the exact option
    // names the kafka connector reads. Construction (format + options +
    // DataStreamReader) must never touch a broker; only .load() would.
    val src = KafkaStreamSource(
      bootstrapServers = "broker1:9092,broker2:9092",
      topics = Seq("events", "orders"),
      startingOffsets = "latest",
      failOnDataLoss = false,
      capPerTrigger = Some(50000L),
      extra = Map("kafka.security.protocol" -> "SASL_SSL"))
    assert(src.format === "kafka")
    assert(src.options === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events,orders",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.security.protocol" -> "SASL_SSL"))
    // reader construction is side-effect-free (no connector, no broker here)
    assert(StreamSource.reader(spark, src) != null)
    assertThrows[IllegalArgumentException](
      KafkaStreamSource("b:9092", topics = Seq.empty))
  }

  test("stream-source seam: file branch streams end-to-end with the per-trigger cap") {
    import graft.streaming.{FileStreamSource, StreamSource}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seam_files").toString
    // three single-file "micro-batch arrivals"
    (1 to 3).foreach(i =>
      Seq((i.toLong, s"payload$i")).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(dir))
    val src = FileStreamSource(dir,
      schema = Some(spark.read.parquet(dir).schema), capPerTrigger = Some(1L))
    assert(src.options("maxFilesPerTrigger") === "1") // R12 cap, file dialect
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    val q = StreamSource.load(spark, src).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= b.select($"id").as[Long].collect(); batches += 1 }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.sorted.toSeq === Seq(1L, 2L, 3L))
    assert(batches >= 3, s"cap=1 must admit one file per micro-batch, got $batches")
  }
}
