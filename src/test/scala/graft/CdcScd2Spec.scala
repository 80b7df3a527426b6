package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics invariants for the CDC materialization pair: q65 latest-wins
  * compaction and q66 SCD Type-2 interval history. Both are additionally
  * DuckDB-oracle-gated; these tests pin the CHANGE-LOG semantics
  * independently of the oracle SQL (tiling, tombstones, version
  * contiguity) so an oracle rewrite can't silently shift meaning. */
class CdcScd2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf).cache()
  private lazy val cdc = SparkEntry.queries("q65_cdc_compaction")(spark, sf).cache()
  private lazy val scd = SparkEntry.queries("q66_scd2_intervals")(spark, sf).cache()

  // Plan gates run FIRST on fresh instances: once the lazy vals above are
  // cached, the cache manager substitutes InMemoryTableScan into any
  // same-plan query (its printed subtree would double-count exchanges).
  test("q65 plan: compaction is one partial-aggregated agg, no window/sort over the log") {
    val p = SparkEntry.queries("q65_cdc_compaction")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"no map-side partial aggregation: $p")
    assert(!p.contains("Window"), s"latest-wins must not window over the log: $p")
  }

  test("q66 plan: one shuffle on user_id serves lag, running sum, island agg and lead") {
    val p = SparkEntry.queries("q66_scd2_intervals")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected a single hash exchange, got $exchanges:\n$p")
  }

  test("q65: one state row per entity, change counts conserve the log") {
    val users = events.select($"user_id").distinct().count()
    assert(cdc.count() === users)
    val total = cdc.agg(sum($"n_changes")).as[Long].head()
    assert(total === events.count(), "every log row must be accounted for")
  }

  test("q65: status is the independently-computed last op (tombstone semantics)") {
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val lastOps = events
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", when($"event_type" === "error", "deleted")
        .otherwise("live").as("want"))
    val diff = cdc.join(lastOps, Seq("user_id"))
      .filter($"status" =!= $"want").count()
    assert(diff === 0L)
  }

  test("q66: intervals tile each entity's history exactly") {
    // per-user event counts conserved across islands
    val perUser = scd.groupBy($"user_id").agg(sum($"n_events").as("n"))
    val want = events.groupBy($"user_id").agg(count(lit(1)).as("w"))
    assert(perUser.join(want, Seq("user_id")).filter($"n" =!= $"w").count() === 0L)
    // versions contiguous from 1, exactly one open (current) interval
    val bad = scd.groupBy($"user_id").agg(
      min($"version").as("lo"), max($"version").as("hi"),
      count(lit(1)).as("n"),
      sum(when($"is_current", 1L).otherwise(0L)).as("open"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n" || $"open" =!= 1L)
    assert(bad.count() === 0L)
  }

  test("q68: attributed credit conserves purchase cents up to truncation") {
    // independent bound, not a replay of the query: total credit must not
    // exceed the purchase cents of conversions that HAVE a qualifying
    // touch, and truncating division loses under one cent per touch row
    val credit = SparkEntry.queries("q68_attribution")(spark, sf)
      .agg(sum($"credit_c"), sum($"n_touches")).as[(Long, Long)].head()
    val conv = events.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts".as("cts"),
        floor($"value" * 100).cast("long").as("total_c"))
    val touched = events.filter($"event_type".isin("view", "click"))
      .select($"user_id", $"ts".as("tts"))
    val qualifying = conv.join(touched, Seq("user_id"))
      .filter($"tts" <= $"cts" &&
        expr("(unix_micros(cts) - unix_micros(tts)) div 86400000000") <= 7)
      .groupBy($"event_id").agg(first($"total_c").as("total_c"))
      .agg(sum($"total_c")).as[Long].head()
    assert(credit._1 <= qualifying)
    assert(credit._1 > qualifying - credit._2, "lost more than 1 cent per touch row")
  }

  test("q78: every purchase lands in exactly one history version (no leakage, no loss)") {
    val report = SparkEntry.queries("q78_pit_join")(spark, sf)
    val matched = report.agg(sum($"n_purchases")).as[Long].head()
    val purchases = events.filter($"event_type" === "purchase").count()
    assert(matched === purchases,
      "point-in-time containment must match each purchase exactly once")
  }

  test("q70: time-weighted average stays within per-user attribute bounds") {
    val twa = SparkEntry.queries("q70_time_weighted_avg")(spark, sf)
    val bounds = events
      .select($"user_id", expr("cast(get_json_object(props, '$.k') as bigint)").as("k"),
        count(lit(1)).over(Window.partitionBy($"user_id")).as("n_events"))
      .groupBy($"user_id")
      .agg(min($"k").as("kmin"), max($"k").as("kmax"), first($"n_events").as("ne"))
    val joined = twa.join(bounds, Seq("user_id")).cache()
    // a weighted mean cannot leave [min, max] (milli-scaled, floor-truncated)
    assert(joined.filter($"twa_k_milli" < $"kmin" * 1000 - 1 ||
      $"twa_k_milli" > $"kmax" * 1000).count() === 0L)
    // each user with n events contributes exactly n-1 holding intervals
    assert(joined.filter($"n_intervals" =!= $"ne" - 1).count() === 0L)
  }

  test("q66: valid_to chains to the successor's valid_from and attribute changes across versions") {
    val wv = Window.partitionBy($"user_id").orderBy($"version")
    val chained = scd
      .withColumn("next_from", lead($"valid_from", 1).over(wv))
      .withColumn("next_kb", lead($"kb", 1).over(wv))
    assert(chained.filter($"valid_to" =!= $"next_from").count() === 0L)
    assert(chained.filter($"next_kb".isNotNull && $"kb" === $"next_kb")
      .count() === 0L, "consecutive versions must differ in the tracked attribute")
  }

}
