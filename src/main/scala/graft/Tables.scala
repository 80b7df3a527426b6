package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated test tables (see TESTDATA.md /
  * FIXTURES.md §B). All queries take an `sfDir` so the same code runs at any
  * scale factor; at cluster scale the same call reads a partitioned
  * directory instead of a single file — parquet scans get column pruning +
  * predicate pushdown from Catalyst either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Schema-adaptive events loader. The driver has shipped `events.ts` in two
    * encodings across fixture generations:
    *  - TIMESTAMP(NANOS) parquet, which Spark 4 rejects outright
    *    (PARQUET_TYPE_ILLEGAL) unless read as nanos-since-epoch long via
    *    `spark.sql.legacy.parquet.nanosAsLong` — then truncated to micros
    *    with exact integer division;
    *  - plain TIMESTAMP(MICROS) without isAdjustedToUTC, which Spark loads
    *    as TIMESTAMP_NTZ — cast to session-zone TimestampType (identity
    *    under the UTC session the harness pins) so every downstream query
    *    sees one type regardless of fixture vintage.
    * Branching on the *loaded* schema (not a conf) means a driver-side
    * fixture regeneration can never silently change query semantics. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected long (nanos), timestamp_ntz, or timestamp")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
