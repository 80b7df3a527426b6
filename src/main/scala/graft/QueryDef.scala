package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a Spark query over the test tables plus (when
  * SQL-expressible) an equivalent DuckDB oracle query the driver hash-matches
  * against (BASELINE.md t2).
  *
  * == Cross-engine determinism convention ==
  * The driver's compare hashes values, so results must be bit-identical
  * between Spark and DuckDB:
  *   - Double SUMs are order-dependent in parallel engines. We therefore sum
  *     money-like doubles as integer cents: `sum(floor(x * 100))` cast to
  *     BIGINT. Per-row double arithmetic is IEEE-deterministic (same input
  *     bits, same op order => same output bits), `floor` removes rounding-mode
  *     concerns, and integer addition is associative — so the aggregate is
  *     exact on both engines regardless of parallelism.
  *   - AVG / VAR are derived from integer sums in double arithmetic
  *     (identical formula on both sides) rather than native fp aggregates.
  *   - MIN/MAX/COUNT are order-insensitive and used raw.
  *   - `events.ts` is nanosecond-precision parquet; Spark truncates to
  *     micros while DuckDB keeps nanos, so queries never emit raw event
  *     timestamps — only date_trunc'd ones (second or coarser).
  *   - Every result carries an unambiguous sort key.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** include in the headline Bench set */
    benchmark: Boolean = true)

object QueryDef {
  /** Shared SQL fragment: integer-cents sum of a double expression —
    * deterministic across engines and parallelism (see scaladoc above). */
  def centsSqlOf(expr: String): String = s"CAST(sum(floor(($expr) * 100)) AS BIGINT)"
}
