package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CONTRACT-layer relational surface (SURVEY.md §2.2): scans, projection,
  * filter, joins (broadcast/shuffle/semi/anti/outer/range), aggregation
  * (hash agg, rollup/cube, distinct), windows (rank/running/lag), sort &
  * top-k, set ops, scalar functions. All built on `org.apache.spark.sql`
  * built-ins so Catalyst owns pushdown / pruning / join selection / AQE —
  * that is the 100 TB scale path: no collect-side loops, no UDFs in hot
  * paths, dimension joins explicitly broadcast.
  */
object RelationalQueries {

  /** Integer-cents sum: deterministic across engines + parallelism (see
    * [[graft.QueryDef]] scaladoc). Sum of exact integers held in doubles is
    * associative; cast to long matches DuckDB's BIGINT cast.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * Seq(19.99, 0.07).toDF("p").agg(RelationalQueries.cents($"p"))
    *   .as[Long].head() == 2005L  // floor(1998.999…) + floor(7.000…)
    * }}}
    */
  def cents(c: Column): Column = sum(floor(c * 100)).cast("long")

  /** Row-level integer cents (projection form of the same convention).
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * Seq(19.99).toDF("p").select(RelationalQueries.centsRow($"p"))
    *   .as[Long].head() == 1998L
    * }}}
    */
  def centsRow(c: Column): Column = floor(c * 100).cast("long")

  val all: Seq[QueryDef] = Seq(

    // ----- aggregation: hash agg, map-side partial agg ---------------------
    QueryDef(
      "q01_agg_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            cents($"l_quantity").as("sum_qty_c"),
            cents($"l_extendedprice").as("sum_base_c"),
            cents($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_c"),
            cents($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge_c"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(floor(l_quantity * 100)) AS BIGINT) AS sum_qty_c,
               CAST(sum(floor(l_extendedprice * 100)) AS BIGINT) AS sum_base_c,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT) AS sum_disc_c,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)) AS BIGINT) AS sum_charge_c,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ----- projection + filter: predicates/projection reach the parquet scan
    QueryDef(
      "q02_filter_projection",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_quantity" >= 49 && $"l_shipdate" >= lit("2000-01-01").cast("timestamp"))
          .select($"l_orderkey", $"l_linenumber",
            centsRow($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue_c"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_c
        FROM lineitem
        WHERE l_quantity >= 49 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber""")),

    // ----- join: star-schema revenue through 3 broadcast dimension joins ---
    QueryDef(
      "q03_join_broadcast_star",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val su = Tables.supplier(s, d)
        val na = Tables.nation(s, d)
        val re = Tables.region(s, d)
        li.join(broadcast(su), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(na), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(re), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(cents($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue_c"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      oracle = Some("""
        SELECT r_name, n_name,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT) AS revenue_c,
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ----- join: fact-to-fact shuffle join (sort-merge / shuffled-hash) ----
    QueryDef(
      "q04_join_shuffle_facts",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(cents($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue_c"),
            countDistinct($"o_orderkey").as("n_orders"))
          .orderBy($"o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT) AS revenue_c,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ----- join: left semi (EXISTS) ----------------------------------------
    QueryDef(
      "q05_join_left_semi",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val big = Tables.lineitem(s, d).filter($"l_quantity" >= 45)
        o.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"), cents($"o_totalprice").as("total_c"))
          .orderBy($"o_orderstatus")
      },
      oracle = Some("""
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(sum(floor(o_totalprice * 100)) AS BIGINT) AS total_c
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // ----- join: left anti (NOT EXISTS) ------------------------------------
    QueryDef(
      "q06_join_left_anti",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val big = Tables.orders(s, d).filter($"o_totalprice" > 400000)
        c.join(big, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"c_mktsegment")
      },
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ----- join: left outer + count-including-zero histogram ---------------
    QueryDef(
      "q07_join_left_outer_histogram",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("n_orders"))
          .groupBy($"n_orders")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"n_orders")
      },
      oracle = Some("""
        SELECT n_orders, count(*) AS n_customers FROM (
          SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        GROUP BY n_orders
        ORDER BY n_orders""")),

    // ----- join: full outer over two aggregates ----------------------------
    QueryDef(
      "q08_join_full_outer",
      (s, d) => {
        import s.implicits._
        val cAgg = Tables.customer(s, d).groupBy($"c_nationkey".as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sAgg = Tables.supplier(s, d).groupBy($"s_nationkey".as("nk2"))
          .agg(count(lit(1)).as("n_supp"))
        cAgg.join(sAgg, $"nk" === $"nk2", "full_outer")
          .select(coalesce($"nk", $"nk2").cast("long").as("nationkey"),
            coalesce($"n_cust", lit(0L)).as("n_cust"),
            coalesce($"n_supp", lit(0L)).as("n_supp"))
          .orderBy($"nationkey")
      },
      oracle = Some("""
        SELECT CAST(coalesce(c.nk, s.nk2) AS BIGINT) AS nationkey,
               coalesce(c.n_cust, 0) AS n_cust,
               coalesce(s.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nk2, count(*) AS n_supp FROM supplier GROUP BY 1) s
        ON c.nk = s.nk2
        ORDER BY nationkey""")),

    // ----- window: ranking (row_number with a total order) ------------------
    QueryDef(
      "q09_window_rank_topn_per_group",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        Tables.lineitem(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber",
            centsRow($"l_extendedprice").as("price_c"))
          .orderBy($"l_suppkey", $"rn")
      },
      oracle = Some("""
        SELECT l_suppkey, rn, l_orderkey, l_linenumber, price_c FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
                 CAST(row_number() OVER (PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
          FROM lineitem)
        WHERE rn <= 3
        ORDER BY l_suppkey, rn""")),

    // ----- window: running aggregate over an ordered frame ------------------
    QueryDef(
      "q10_window_running_sum",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
            $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            sum(centsRow($"l_quantity")).over(w).as("running_qty_c"))
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
      },
      oracle = Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ----- window: lag/lead analytics --------------------------------------
    QueryDef(
      "q11_window_lag_delta",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        Tables.orders(s, d)
          .select($"o_custkey", $"o_orderkey",
            (centsRow($"o_totalprice") -
              coalesce(lag(centsRow($"o_totalprice"), 1).over(w), lit(0L))).as("delta_c"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT)
                 - coalesce(lag(CAST(floor(o_totalprice * 100) AS BIGINT), 1) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0) AS delta_c
        FROM orders
        ORDER BY o_custkey, o_orderkey""")),

    // ----- sort + global top-k (TakeOrderedAndProject) ----------------------
    QueryDef(
      "q12_topk_global",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .select($"o_orderkey", centsRow($"o_totalprice").as("price_c"))
          .limit(10)
      },
      oracle = Some("""
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10""")),

    // ----- set ops: EXCEPT / INTERSECT / UNION with provenance tag ----------
    QueryDef(
      "q13_set_ops",
      (s, d) => {
        import s.implicits._
        val cn = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey")).distinct()
        val sn = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey")).distinct()
        val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
        val both = cn.intersect(sn).withColumn("tag", lit("both"))
        custOnly.unionByName(both).orderBy($"tag", $"nationkey")
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT nationkey, 'cust_only' AS tag FROM
            (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             EXCEPT
             SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier)
          UNION ALL
          SELECT nationkey, 'both' AS tag FROM
            (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             INTERSECT
             SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier))
        ORDER BY tag, nationkey""")),

    // ----- distinct / multi-column count distinct ---------------------------
    // Scale shape: multi-distinct over raw rows plans an Expand that
    // triples the input before the shuffle. Pre-reducing to the distinct
    // (group, partkey, suppkey) combinations first is a plain map-side-
    // combinable hash agg; the multi-distinct then runs over the (much
    // smaller) combination table — the standard two-level distinct
    // pattern for large fact tables.
    QueryDef(
      "q14_count_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_partkey", $"l_suppkey")
          .agg(count(lit(1)).as("c"))
          .groupBy($"l_returnflag")
          .agg(countDistinct($"l_partkey").as("n_parts"),
            count(lit(1)).as("n_part_supp"),
            sum($"c").cast("long").as("n_rows"))
          .orderBy($"l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ----- rollup with grouping() -------------------------------------------
    QueryDef(
      "q15_rollup",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), cents($"l_quantity").as("qty_c"),
            grouping($"l_returnflag").cast("long").as("g_rf"),
            grouping($"l_linestatus").cast("long").as("g_ls"))
          .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
            coalesce($"l_linestatus", lit("ALL")).as("ls"),
            $"n", $"qty_c", $"g_rf", $"g_ls")
          .orderBy($"rf", $"ls")
      },
      oracle = Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n,
               CAST(sum(floor(l_quantity * 100)) AS BIGINT) AS qty_c,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ----- cube -------------------------------------------------------------
    QueryDef(
      "q16_cube",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"), $"n")
          .orderBy($"status", $"priority")
      },
      oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ----- scalar string functions ------------------------------------------
    QueryDef(
      "q17_scalar_string",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter($"p_type".like("%M%"))
          .select($"p_partkey",
            upper($"p_name").as("uname"),
            substring($"p_name", 1, 4).as("prefix"),
            concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
            regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
            regexp_replace($"p_name", "[aeiou]", "_").as("devowel"),
            size(split($"p_name", " ")).cast("long").as("n_words"),
            levenshtein($"p_brand", lit("Brand#13")).cast("long").as("lev"),
            length(trim($"p_name")).cast("long").as("len"))
          .orderBy($"p_partkey")
      },
      oracle = Some("""
        SELECT p_partkey,
               upper(p_name) AS uname,
               substring(p_name, 1, 4) AS prefix,
               concat_ws('|', p_brand, p_type) AS brand_type,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
               CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
               CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS lev,
               CAST(length(trim(p_name)) AS BIGINT) AS len
        FROM part
        WHERE p_type LIKE '%M%'
        ORDER BY p_partkey""")),

    // ----- scalar date/time functions ----------------------------------------
    QueryDef(
      "q18_scalar_datetime",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey",
            year($"o_orderdate").cast("long").as("y"),
            quarter($"o_orderdate").cast("long").as("q"),
            month($"o_orderdate").cast("long").as("m"),
            dayofweek($"o_orderdate").cast("long").as("dow"),
            datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            date_trunc("month", $"o_orderdate").as("month_start"))
          .orderBy($"o_orderkey")
      },
      oracle = Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
               date_trunc('month', o_orderdate) AS month_start
        FROM orders
        ORDER BY o_orderkey""")),

    // ----- scalar math (IEEE-deterministic subset) ---------------------------
    QueryDef(
      "q19_scalar_math",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_orderkey" % 97 === 0)
          .select($"l_orderkey", $"l_linenumber",
            abs($"l_discount" - 0.05).as("abs_d"),
            sqrt($"l_quantity").as("sqrt_qty"),
            ($"l_quantity" * $"l_quantity").as("qty_sq"),
            floor($"l_extendedprice" / 1000).cast("long").as("price_k"),
            ceil($"l_extendedprice" / 1000).cast("long").as("price_k_up"),
            ($"l_orderkey" % 7).cast("long").as("mod7"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_d,
               sqrt(l_quantity) AS sqrt_qty,
               l_quantity * l_quantity AS qty_sq,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
               CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_up,
               l_orderkey % 7 AS mod7
        FROM lineitem
        WHERE l_orderkey % 97 = 0
        ORDER BY l_orderkey, l_linenumber""")),

    // ----- conditional expressions (CASE WHEN tiers) -------------------------
    QueryDef(
      "q20_case_when_tiers",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(
            when($"o_totalprice" < 100000, "small")
              .when($"o_totalprice" < 300000, "medium")
              .otherwise("large").as("tier"))
          .groupBy($"tier").agg(count(lit(1)).as("n"))
          .orderBy($"tier")
      },
      oracle = Some("""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                    WHEN o_totalprice < 300000 THEN 'medium'
                    ELSE 'large' END AS tier,
               count(*) AS n
        FROM orders
        GROUP BY 1
        ORDER BY tier""")),

    // ----- range join: fact against broadcast interval table -----------------
    QueryDef(
      "q21_range_join_buckets",
      (s, d) => {
        import s.implicits._
        val buckets = s.range(0, 20)
          .select($"id", (lit(900.0) + $"id").as("lo"), (lit(901.0) + $"id").as("hi"))
        val p = Tables.part(s, d)
        // tiny interval table broadcast => BroadcastNestedLoopJoin, no shuffle
        p.join(broadcast(buckets), $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
          .groupBy($"id").agg(count(lit(1)).as("n_parts"))
          .orderBy($"id")
      },
      oracle = Some("""
        SELECT b.id, count(*) AS n_parts
        FROM part p
        JOIN (SELECT range AS id, 900.0 + range AS lo, 901.0 + range AS hi
              FROM range(0, 20)) b
          ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
        GROUP BY b.id
        ORDER BY b.id""")),

    // ----- discrete median (exact) ------------------------------------------
    // Scale shape: a row_number window partitioned by l_returnflag would
    // sort ALL rows in only 3 window partitions (3 tasks at any data size).
    // Instead: value-histogram selection — count per (group, value) with a
    // fully parallel hash agg, then walk the tiny per-group cumulative
    // histogram (3 groups x ~50 distinct quantities) to the (n+1)/2-th
    // element. Exact for discrete domains; continuous domains would use
    // percentile_approx or iterated range-partition selection instead.
    QueryDef(
      "q22_median_disc",
      (s, d) => {
        import s.implicits._
        val hist = Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_quantity")
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy($"l_returnflag").orderBy($"l_quantity")
        hist
          .withColumn("cum", sum($"c").over(w))
          .withColumn("n", sum($"c").over(Window.partitionBy($"l_returnflag")))
          .withColumn("target", floor(($"n" + 1) / lit(2.0)).cast("long"))
          .filter($"cum" >= $"target" && $"cum" - $"c" < $"target")
          .select($"l_returnflag", $"l_quantity".as("median_qty"), $"n")
          .orderBy($"l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag, median_qty, n FROM (
          SELECT l_returnflag, l_quantity AS median_qty,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem)
        WHERE rn = (n + 1) // 2
        ORDER BY l_returnflag""")),

    // ----- variance/stddev from exact integer sums ---------------------------
    QueryDef(
      "q23_variance_from_int_sums",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(centsRow($"l_quantity")).as("s1"),
            sum(centsRow($"l_quantity") * centsRow($"l_quantity")).as("s2"))
          .select($"l_linestatus", $"n",
            (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("var_qty_c2"))
          .orderBy($"l_linestatus")
      },
      oracle = Some("""
        SELECT l_linestatus, n, (s2 - s1 * s1 / n) / (n - 1) AS var_qty_c2 FROM (
          SELECT l_linestatus, count(*) AS n,
                 sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS s1,
                 sum(CAST(floor(l_quantity * 100) AS BIGINT) * CAST(floor(l_quantity * 100) AS BIGINT)) AS s2
          FROM lineitem GROUP BY l_linestatus)
        ORDER BY l_linestatus""")),

    // ----- approximate aggregates (sketches) ---------------------------------
    // Sketch estimates are algorithm-specific, so the raw estimate has no
    // cross-engine oracle. Checkable form instead: emit the EXACT values
    // (both engines compute them identically) plus booleans asserting the
    // sketch landed within tolerance of the exact value — computed
    // Spark-side from Spark's own sketches, while DuckDB emits literal
    // TRUE. Rows/schema/hash match iff the sketches actually hit their
    // bounds: HLL++ at rsd=0.01 makes ±5% a 5-sigma bound; KLL at
    // accuracy=10000 bounds rank error at 0.01%, far inside ±5% on this
    // price distribution. (SketchSpec additionally bounds the raw
    // estimates against exact values.)
    //
    // Plan shape: the distinct counts and the percentiles are SEPARATE
    // aggregations joined on the 3-row group key. Mixing countDistinct
    // with object-buffer aggs (percentile, HLL) in one agg routes them
    // all through the distinct Expand — measured 10x slower at sf0.1.
    // Both distinct counts run on the pre-reduced (flag, partkey) pair
    // table (the q14 trick): exact becomes a plain count, and HLL over
    // the dedup'd pairs has bit-identical registers (HLL is
    // duplicate-insensitive), so partial aggregation stays map-side.
    QueryDef(
      "q24_approx_sketches",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val parts = li.groupBy($"l_returnflag", $"l_partkey").agg(count(lit(1)))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("exact_parts"),
            approx_count_distinct($"l_partkey", 0.01).as("ap"))
        // exact median via q45's two-level range-partition selection: the
        // price domain has ~10M distinct cents, so a window over the full
        // cents histogram degenerates to a 3-partition sort tail (measured
        // 1.5 s of this query's 2.5 s at sf0.1). Coarse 65536-cent buckets
        // (parallel hash agg, window over <=~200 entries) locate the
        // bucket straddling rank n/2; a fine cents histogram inside that
        // one bucket resolves the exact value. Both windows constant-size
        // at any data scale.
        val cents = floor($"l_extendedprice" * 100).cast("long")
        val wb = Window.partitionBy($"l_returnflag").orderBy($"b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pick = li.groupBy($"l_returnflag", (cents / 65536L).cast("long").as("b"))
          .agg(count(lit(1)).as("hn"))
          .withColumn("cum", sum($"hn").over(wb))
          .withColumn("n", sum($"hn").over(Window.partitionBy($"l_returnflag")))
          .filter($"cum" * 2 >= $"n" && ($"cum" - $"hn") * 2 < $"n")
          .select($"l_returnflag", $"b", ($"cum" - $"hn").as("before"), $"n")
        val wf = Window.partitionBy($"l_returnflag").orderBy($"c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val em = li
          .select($"l_returnflag", cents.as("c"), (cents / 65536L).cast("long").as("b"))
          .join(broadcast(pick), Seq("l_returnflag", "b"))
          .groupBy($"l_returnflag", $"before", $"n", $"c")
          .agg(count(lit(1)).as("fn"))
          .withColumn("cum", $"before" + sum($"fn").over(wf))
          .filter($"cum" * 2 >= $"n" && ($"cum" - $"fn") * 2 < $"n")
          .select($"l_returnflag", ($"c" / 100.0).as("em"))
        val prices = li.groupBy($"l_returnflag")
          .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("am"))
          .join(em, "l_returnflag")
        parts.join(prices, "l_returnflag")
          .select($"l_returnflag", $"exact_parts",
            ($"ap" >= $"exact_parts" * 0.95 && $"ap" <= $"exact_parts" * 1.05)
              .as("approx_parts_within_5pct"),
            ($"am" >= $"em" * 0.95 && $"am" <= $"em" * 1.05)
              .as("approx_median_within_5pct"))
          .orderBy($"l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               TRUE AS approx_parts_within_5pct,
               TRUE AS approx_median_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))
  )
}
