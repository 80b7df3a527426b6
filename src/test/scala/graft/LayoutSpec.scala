package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.LayoutQueries

/** Plan/skipping gates for the physical-layout queries (q51/q52): the
  * RESULTS are oracle-checked by the driver; these tests pin down the thing
  * the layout is FOR — no exchange under the bucketed join, row-group
  * skipping on both z-order dimensions. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft_layout_spec").toString

  test("zValue2 interleaves bits (Morton order)") {
    // z(a,b): bit i of a -> 2i, bit i of b -> 2i+1
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 3L, 14L),            // a=10b -> ..0100, b=11b -> ..1010 => 1110b
      (7L, 0L, 21L),            // 111b  -> 010101b
      (0L, 7L, 42L),            // 111b  -> 101010b
      ((1L << 20), 0L, 1L << 40)) // top supported bit lands at position 2*20
    val df = cases.toDF("a", "b", "expect")
      .withColumn("z", LayoutQueries.zValue2($"a", $"b"))
    assert(df.filter($"z" =!= $"expect").count() === 0,
      df.collect().mkString("\n"))
  }

  test("zValue2 preserves rectangle locality: quadrants are contiguous z-ranges") {
    // Every point in the low-low quadrant [0,2^k) x [0,2^k) has a smaller
    // z-value than any point with a coordinate >= 2^k — the property that
    // makes min/max stats tight after a z-sort.
    val k = 8
    val pts = for (a <- 0 until 40; b <- 0 until 40)
      yield (a.toLong * 7 % 600, b.toLong * 13 % 600)
    val df = pts.toDF("a", "b").withColumn("z", LayoutQueries.zValue2($"a", $"b"))
    val inMax = df.filter($"a" < (1 << k) && $"b" < (1 << k)).agg(max($"z")).head.getLong(0)
    val outMin = df.filter($"a" >= (1 << k) || $"b" >= (1 << k)).agg(min($"z")).head.getLong(0)
    assert(inMax < outMin, s"quadrant not contiguous: inMax=$inMax outMin=$outMin")
  }

  /** Executes df and sums its leaf scans' output rows (post row-group skip). */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout skips row groups on BOTH dimensions; 1-D sort only on its own") {
    // Two same-magnitude key domains (orderkey x partkey) so the 2-D
    // geometry is visible even at test SF; 100-row files = 60 z-tiles,
    // each covering roughly a sqrt(1/60) ~ 13% span of EACH dimension.
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey", $"l_extendedprice")
    val total = li.count()
    val (max1, max2) = {
      val r = li.agg(max($"l_orderkey"), max($"l_partkey")).head
      (r.getLong(0), r.getLong(1).toLong)
    }
    LayoutQueries.zOrderWrite(li, "l_orderkey", "l_partkey", files = 8,
      path = s"$tmp/li_z", maxRecordsPerFile = 100)
    li.repartitionByRange(8, $"l_orderkey").sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").option("maxRecordsPerFile", "100")
      .parquet(s"$tmp/li_1d")
    def band1(path: String) = // narrow band (1/16 of the domain) on dim 1
      scanRows(spark.read.parquet(path).filter($"l_orderkey" <= max1 / 16))
    def band2(path: String) = // narrow band on dim 2
      scanRows(spark.read.parquet(path).filter($"l_partkey" <= max2 / 16))
    val (z1, z2) = (band1(s"$tmp/li_z"), band2(s"$tmp/li_z"))
    val (d1, d2) = (band1(s"$tmp/li_1d"), band2(s"$tmp/li_1d"))
    info(s"total=$total z=($z1,$z2) 1d=($d1,$d2)")
    // z-order prunes both dimensions (tile span + band width << domain)
    assert(z1 < total * 2 / 5, s"z layout should skip on dim1: $z1 of $total")
    assert(z2 < total * 2 / 5, s"z layout should skip on dim2: $z2 of $total")
    // the 1-D layout prunes its own key but NOT the other dimension
    assert(d1 < total / 8)
    assert(d2 > z2 * 2,
      s"1-D sort should scan far more of dim2 than z-order: 1d=$d2 z=$z2")
  }

  test("q51 plans with no exchange below the bucketed sort-merge join") {
    val df = SparkEntry.queries("q51_bucketed_colocated_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan)
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(df.count() > 0)
  }

  test("compact squeezes a small-file table into bounded files, preserving data + pruning") {
    import graft.operators.LayoutQueries
    val inDir = s"$tmp/frag"
    val outDir = s"$tmp/compacted"
    // fragment lineitem into ~hundreds of tiny files across 3 partitions
    Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_orderkey", $"l_quantity", $"l_extendedprice")
      .repartition(64)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(inDir)
    val (nIn, nOut) = LayoutQueries.compact(spark, inDir, outDir,
      Seq("l_returnflag"), targetBytes = 256L << 10)
    assert(nIn > 50, s"fixture not fragmented enough: $nIn files")
    assert(nOut < nIn / 4, s"compaction barely squeezed: $nIn -> $nOut files")
    // data identical (same rows, same checksums)
    def sig(dir: String) = spark.read.parquet(dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_orderkey").as("ks"),
        sum(floor($"l_extendedprice" * 100)).cast("long").as("cs"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(sig(outDir) === sig(inDir))
    // hive partitioning preserved: the filter lands in PartitionFilters
    // (listing-time pruning), not a post-scan Filter over all files
    val pruned = spark.read.parquet(outDir).filter($"l_returnflag" === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag") ||
      plan.contains("PartitionFilters: [(l_returnflag"),
      s"partition pruning lost after compaction:\n$plan")
    // self- and nested-target compaction would truncate the source via the
    // overwrite write: must be rejected before any IO, source left intact
    for (bad <- Seq(inDir, s"$inDir/l_returnflag=R", s"$tmp/frag/..")) {
      val e = intercept[IllegalArgumentException] {
        LayoutQueries.compact(spark, inDir, bad, Seq("l_returnflag"))
      }
      assert(e.getMessage.contains("must not equal or nest"), s"$bad: ${e.getMessage}")
    }
    assert(sig(inDir).nonEmpty)
  }

  test("q52 result is layout-independent (matches the unclustered rectangle)") {
    val got = SparkEntry.queries("q52_zorder_skipping")(spark, sf).collect()
    val want = Tables.lineitem(spark, sf)
      .filter($"l_partkey".between(100, 299) && $"l_suppkey".between(10, 29))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n"),
        sum(floor($"l_extendedprice" * 100)).cast("long").as("rev_c"))
      .orderBy($"l_suppkey").collect()
    assert(got.toSeq === want.toSeq)
  }
}
