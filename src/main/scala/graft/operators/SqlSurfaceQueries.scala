package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Modern ANSI-SQL surface (SURVEY.md §2.2 extension, round 4): the three
  * SQL-level capabilities a user migrating a warehouse workload hits next —
  * recursive CTEs, LATERAL correlated subqueries, and semi-structured
  * VARIANT columns. Each row follows the q38 policy where possible: ONE SQL
  * text runs verbatim on both engines, so the oracle also proves dialect
  * agreement, not just value agreement.
  *
  * Scale notes (100 TB):
  *  - q56: Spark 4 executes `WITH RECURSIVE` natively (`UnionLoopExec`) —
  *    each iteration is a distributed join of the previous frontier, exactly
  *    the shape our hand-rolled iterative graph queries (q48/q55) use, but
  *    driver-coordinated per step. For deep or unbounded recursions over big
  *    frontiers the explicit loop with `localCheckpoint` lineage truncation
  *    (EventQueries.bfsLevels) remains the preferred scale path; the SQL
  *    form is for bounded-depth hierarchy walks where convenience wins.
  *  - q57: LATERAL per-group top-k decorrelates to the same window/limit
  *    plan as q09's row_number filter — no per-row subquery execution, one
  *    shuffle on the correlation key. The lateral FORM matters because it is
  *    what BI tools and migrated warehouse SQL actually emit.
  *  - q58: VARIANT parses JSON ONCE into a typed binary encoding at ingest;
  *    every later `variant_get` is a binary path lookup, not a re-parse. At
  *    100 TB this turns "regex over strings per query" into "columnar binary
  *    access", and parquet VARIANT shredding makes extracted paths prunable
  *    like real columns. The oracle computes identical aggregates straight
  *    from the raw columns, so the whole construct→parse→extract round trip
  *    is value-checked end to end.
  */
object SqlSurfaceQueries {

  /** q56 — recursive CTE, one SQL text on both engines. A per-region chain
    * over nations (edges = consecutive nation keys within a region, from a
    * window `lead`) is walked from each region's minimum key. The chain key
    * is strictly increasing, so the recursion provably terminates with depth
    * = nations-per-region; results are exact integers.
    */
  private val RecursiveChainSql = """
    WITH RECURSIVE
    edges AS (
      SELECT CAST(n_regionkey AS BIGINT) AS rk,
             CAST(n_nationkey AS BIGINT) AS src,
             CAST(lead(n_nationkey) OVER (PARTITION BY n_regionkey
                                          ORDER BY n_nationkey) AS BIGINT) AS dst
      FROM nation),
    roots AS (SELECT rk, min(src) AS node FROM edges GROUP BY rk),
    walk(rk, node, depth) AS (
      SELECT rk, node, CAST(0 AS BIGINT) FROM roots
      UNION ALL
      SELECT w.rk, e.dst, w.depth + 1
      FROM walk w JOIN edges e
        ON e.rk = w.rk AND e.src = w.node AND e.dst IS NOT NULL)
    SELECT rk AS region_key,
           CAST(count(*) AS BIGINT) AS chain_len,
           CAST(max(depth) AS BIGINT) AS max_depth,
           CAST(sum(node * depth) AS BIGINT) AS weighted_sum
    FROM walk
    GROUP BY rk
    ORDER BY region_key"""

  /** q57 — LATERAL correlated subquery with ORDER BY + LIMIT: top-3
    * customers by account balance per nation, one SQL text on both engines.
    * Catalyst decorrelates the per-row subquery into a window top-k (gated
    * in SqlSurfaceSpec: no nested-loop, no per-row re-execution).
    */
  /** One SQL text executed verbatim by BOTH engines (q83): GROUP BY ALL —
    * keys inferred from the non-aggregate select items. MUST be declared
    * above `val all`. */
  private val GroupByAllSql = """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(floor(l_extendedprice * 100)) AS BIGINT) AS rev_c,
               CAST(sum(floor(l_quantity)) AS BIGINT) AS qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus"""

  private val LateralTopKSql = """
    SELECT n.n_name AS nation, t.customer, t.bal_c
    FROM nation n, LATERAL (
      SELECT c.c_name AS customer,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY bal_c DESC, c.c_name
      LIMIT 3) t
    ORDER BY nation, bal_c DESC, customer"""

  def all: Seq[QueryDef] = Seq(
    QueryDef(
      "q56_recursive_cte",
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation")
        s.sql(RecursiveChainSql)
      },
      oracle = Some(RecursiveChainSql)),

    QueryDef(
      "q57_lateral_topk",
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation")
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql(LateralTopKSql)
      },
      oracle = Some(LateralTopKSql)),

    // ----- GROUP BY ALL (modern ANSI shorthand) -----------------------------
    // One SQL text, verbatim on both engines: GROUP BY ALL infers the
    // grouping keys from the non-aggregate select items — the analyzer
    // must pick exactly (l_returnflag, l_linestatus) here. Catches an
    // engine whose inference diverges (e.g. grouping an aliased scalar).
    QueryDef(
      "q83_group_by_all",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(GroupByAllSql)
      },
      oracle = Some(GroupByAllSql)),

    // ----- VARIANT semi-structured round trip ------------------------------
    // Build a nested JSON document from typed columns, parse it to VARIANT,
    // extract nested-object and array-index paths back out, and aggregate.
    // The oracle computes the same aggregates from the RAW columns, so any
    // loss anywhere in construct -> parse_json -> variant_get fails the
    // hash. (`props` is itself JSON, so its value transits TWO parses.)
    QueryDef(
      "q58_variant_extract",
      (s, d) => {
        import s.implicits._
        val doc = to_json(struct(
          $"event_id".as("id"),
          struct($"user_id".as("u"), $"event_type".as("t")).as("who"),
          array(floor($"value" * 100).cast("long"),
                get_json_object($"props", "$.k").cast("long")).as("vals")))
        Tables.events(s, d)
          .select(parse_json(doc).as("v"))
          .select(
            variant_get($"v", "$.who.t", "string").as("event_type"),
            variant_get($"v", "$.who.u", "bigint").as("uid"),
            variant_get($"v", "$.vals[0]", "bigint").as("cents"),
            variant_get($"v", "$.vals[1]", "bigint").as("k"))
          .groupBy($"event_type")
          .agg(
            sum($"k").as("k_sum"),
            sum($"cents").as("cents_sum"),
            countDistinct($"uid").as("users"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(sum(floor(value * 100)) AS BIGINT) AS cents_sum,
               CAST(count(DISTINCT user_id) AS BIGINT) AS users
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))
  )
}
