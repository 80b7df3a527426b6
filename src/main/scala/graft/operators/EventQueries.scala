package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal / event-stream surface over the `events` fixture (SURVEY.md
  * §2.2 streaming semantics + as-of join). These run as batch here; the same
  * column expressions run under `readStream` (see graft.streaming and the
  * streaming specs) — windows and watermarks are identical in both modes.
  *
  * Scale notes: the as-of join is the shuffle-once/sort-within-partition
  * formulation (union + last(ignoreNulls) over a key-partitioned window) —
  * no per-row lookups, no broadcast of the big side, skew-safe under AQE.
  * `events.ts` is ns-precision parquet: Spark truncates to micros, DuckDB
  * keeps nanos, so queries only ever emit date_trunc'd times (see QueryDef).
  */
object EventQueries {
  import RelationalQueries.{cents, centsRow}

  val all: Seq[QueryDef] = Seq(

    // ----- semi-structured: JSON props extraction ---------------------------
    QueryDef(
      "q30_json_extract_agg",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"),
            $"value")
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"), cents($"value").as("value_c"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n,
               CAST(sum(floor(value * 100)) AS BIGINT) AS value_c
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ----- as-of join: each event -> latest order at-or-before its time -----
    QueryDef(
      "q31_asof_join",
      (s, d) => {
        import s.implicits._
        // de-dup state rows per (key, time) so the as-of pick is total-ordered
        val ord = Tables.orders(s, d)
          .groupBy($"o_custkey".as("k"), $"o_orderdate".as("t"))
          .agg(max($"o_orderkey").as("o_orderkey"))
          .select($"k", $"t", $"o_orderkey", lit(1).as("is_state"),
            lit(null).cast("long").as("event_id"))
        val ev = Tables.events(s, d)
          .select($"user_id".as("k"), $"ts".as("t"),
            lit(null).cast("long").as("o_orderkey"), lit(0).as("is_state"),
            $"event_id")
        // state rows sort before events at the same instant => inclusive as-of
        val w = Window.partitionBy($"k").orderBy($"t", $"is_state".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ord.unionByName(ev)
          .withColumn("matched_order", last($"o_orderkey", ignoreNulls = true).over(w))
          .filter($"is_state" === 0)
          .select($"event_id", coalesce($"matched_order", lit(-1L)).as("matched_order"))
          .orderBy($"event_id")
      },
      oracle = Some("""
        WITH ord AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, coalesce(o.o_orderkey, -1) AS matched_order
        FROM events e
        ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id""")),

    // ----- tumbling window aggregation (batch form of streaming window) -----
    QueryDef(
      "q32_tumbling_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), cents($"value").as("value_c"))
          .select(unix_timestamp($"w.start").as("w_start_epoch"),
            $"event_type", $"n", $"value_c")
          .orderBy($"w_start_epoch", $"event_type")
      },
      oracle = Some("""
        SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start_epoch,
               event_type, count(*) AS n,
               CAST(sum(floor(value * 100)) AS BIGINT) AS value_c
        FROM events
        GROUP BY 1, 2
        ORDER BY w_start_epoch, event_type""")),

    // ----- sliding window aggregation ---------------------------------------
    QueryDef(
      "q33_sliding_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "2 hours", "1 hour").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(unix_timestamp($"w.start").as("w_start_epoch"), $"n")
          .orderBy($"w_start_epoch")
      },
      // each event lands in 2 hourly-offset 2h windows: window starts at
      // hour(ts) and hour(ts)-1
      oracle = Some("""
        SELECT w_start_epoch, count(*) AS n FROM (
          SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start_epoch
          FROM events
          UNION ALL
          SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) - 3600
          FROM events)
        GROUP BY 1
        ORDER BY w_start_epoch""")),

    // ----- session windows (30 min gap) per user ----------------------------
    QueryDef(
      "q34_session_windows",
      (s, d) => {
        import s.implicits._
        val sess = Tables.events(s, d)
          .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"))
        sess.groupBy($"user_id")
          .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"),
            max($"n_events").as("max_session_events"))
          .orderBy($"user_id")
      },
      // gaps-and-islands replica: a new session starts when the gap from the
      // previous event of the same user is >= 30 minutes
      oracle = Some("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL '30 minutes'
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events),
        sess AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM marked),
        per_sess AS (
          SELECT user_id, sess_id, count(*) AS n_events
          FROM sess GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
               max(n_events) AS max_session_events
        FROM per_sess
        GROUP BY user_id
        ORDER BY user_id""")),

    // ----- event-type funnel: first signup -> first purchase delta per user --
    QueryDef(
      "q35_funnel_first_events",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .filter($"event_type".isin("signup", "purchase"))
          .groupBy($"user_id")
          .agg(
            min(when($"event_type" === "signup", $"ts")).as("first_signup"),
            min(when($"event_type" === "purchase", $"ts")).as("first_purchase"))
          .filter($"first_signup".isNotNull && $"first_purchase".isNotNull &&
            $"first_purchase" >= $"first_signup")
          .select($"user_id",
            floor((unix_timestamp($"first_purchase") - unix_timestamp($"first_signup")) / 60)
              .cast("long").as("minutes_to_purchase"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        SELECT user_id,
               CAST(floor(epoch(date_trunc('second', first_purchase)
                 - date_trunc('second', first_signup)) / 60) AS BIGINT) AS minutes_to_purchase
        FROM (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
          FROM events
          WHERE event_type IN ('signup', 'purchase')
          GROUP BY user_id)
        WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_signup
        ORDER BY user_id""")))
}
