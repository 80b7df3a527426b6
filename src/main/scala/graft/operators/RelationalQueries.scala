package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTRACT-layer relational surface (SURVEY.md §2.2): scans, projection,
  * filter, joins, aggregation, windows, sort/top-k, set ops, scalar
  * functions. All built on `org.apache.spark.sql` built-ins so Catalyst owns
  * pushdown / pruning / join selection / AQE — the scale path for 100 TB.
  */
object RelationalQueries {

  /** Integer-cents sum: deterministic across engines + parallelism (see
    * [[graft.QueryDef]] scaladoc). Sum of exact integers held in doubles is
    * associative; cast to long matches DuckDB's BIGINT cast. */
  def cents(c: Column): Column = sum(floor(c * 100)).cast("long")

  val all: Seq[QueryDef] = Seq(

    // ----- aggregation: hash agg with map-side partial aggregation --------
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
        ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )
}
