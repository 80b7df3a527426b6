package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 probe-data generator: a 10x replica of the sf0.1 fixtures in which
  * each copy is a semantically DISJOINT universe, so every operator's
  * workload scales by exactly 10x without changing SHAPE. Naive
  * duplication would make every document an exact dup of its 9 siblings
  * and every embedding cosine-identical — quadratically exploding the
  * pair-listing outputs and measuring a different (adversarial) workload,
  * not scale. Per table:
  *
  *  - documents: ids shift by copy x 10^9; every token LONGER THAN 3
  *    CHARS gets a per-copy suffix — a bijection on the content
  *    vocabulary, so within-copy shingle sets, jaccards, and near-dup
  *    pairs are exactly the original's, cross-copy jaccard collapses to
  *    ~0 (only pure-stopword trigrams survive, far below the 0.8 bar),
  *    and the stopword-based language id is preserved;
  *  - embeddings: ids shift; per copy k > 0, a splitmix-chosen half of
  *    the 64 dims flips sign — an isometry (within-copy cosines exact)
  *    that decoheres cross-copy cosines and sign-LSH buckets;
  *  - events: event/user ids shift; the props graph key `k` shifts by
  *    copy x 10^6 — the event graph becomes 10 disjoint copies (q48's
  *    node set scales 10x; q55's single-source frontier is
  *    reachability-bounded by construction — its scan/edge-dedup stages
  *    are what scale);
  *  - lineitem: the three join keys shift; measure/dimension columns pass
  *    through (a profile's value domain repeats at scale — the honest
  *    shape for q60/q102);
  *  - dimension tables pass through (the probe queries don't read them;
  *    Bench's warmup loads them).
  *
  * Drive: `runMain graft.ScaleProbe [outDir [srcDir]]`, then Bench with
  * `SPARK_GRAFT_SF_DIR=outDir SPARK_GRAFT_ONLY=<heavy set>`. The round-6
  * measurement lives in bench/sf1_probe.json. */
object ScaleProbe {

  private val Copies = 10
  private val IdStride = 1000000000L
  private val GraphStride = 1000000L

  /** splitmix64 finalizer — deterministic per-(copy, dim) sign choice. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1probe")
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicated(f: Int => DataFrame): DataFrame =
      (0 until Copies).map(f).reduce(_ unionByName _)

    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders"))
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    val docs = Tables.documents(spark, src)
    replicated { k =>
      // copy 0 passes through untouched (mirroring the embeddings branch)
      // so the probe data is a strict superset of the sf0.1 fixture; only
      // copies k > 0 get the vocabulary bijection, and THEIR n_chars is
      // recomputed so the metadata column matches the rewritten text.
      val text =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S{4,})", "$1" + k)
      val nChars =
        if (k == 0) col("n_chars")
        else length(text).cast(docs.schema("n_chars").dataType)
      docs.select((col("doc_id") + k * IdStride).as("doc_id"),
        text.as("text"), col("lang"), col("source"), nChars.as("n_chars"))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = Tables.embeddings(spark, src)
    replicated { k =>
      val flips = array((0 until 64).map(i =>
        lit(if (k > 0 && (mix(k * 64L + i) & 1L) == 1L) -1.0f else 1.0f)): _*)
      embs.select((col("vec_id") + k * IdStride).as("vec_id"),
        zip_with(col("embedding"), flips, (x, s) => x * s).as("embedding"),
        col("label"))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = Tables.load(spark, src, "events")
    replicated { k =>
      val kcol = get_json_object(col("props"), "$.k").cast("long")
      ev.select((col("event_id") + k * IdStride).as("event_id"), col("ts"),
        (col("user_id") + k * IdStride).as("user_id"),
        col("event_type"), col("value"),
        when(kcol.isNotNull,
          concat(lit("{\"k\":"), (kcol + k * GraphStride).cast("string"), lit("}")))
          .otherwise(col("props")).as("props"))
    }.write.mode("overwrite").parquet(s"$out/events.parquet")

    val li = Tables.lineitem(spark, src)
    replicated { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + k * IdStride)
        .withColumn("l_partkey", col("l_partkey") + k * IdStride)
        .withColumn("l_suppkey", col("l_suppkey") + k * IdStride)
    }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    println(s"""{"probe_dir":"$out","copies":$Copies,"src":"$src"}""")
    spark.stop()
  }
}
