package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

/** Source-construction seam for the streaming operators.
  *
  * The reference's push channel (`/root/reference/src/streams/
  * overeager_receivers.rs:29-32`) is a bounded in-process queue; its Spark
  * equivalents differ by runtime: MemoryStream in tests, file streams for
  * replayable directories, Kafka in production. Every streaming operator in
  * graft takes a plain streaming DataFrame, so the ONLY place runtime
  * plumbing lives is here — swap the [[StreamSource]] and nothing else
  * changes.
  *
  * The R12 bounded-channel capacity maps onto each runtime's native
  * admission throttle via [[StreamSource.capPerTrigger]]:
  *   - Kafka: `maxOffsetsPerTrigger` (records per micro-batch across
  *     partitions)
  *   - files: `maxFilesPerTrigger`
  *   - MemoryStream: the OvereagerReceiver test harness's own bounded cap
  *     (StreamingSpec's backpressure pair)
  *
  * The sandbox has no Kafka broker OR connector jar, so the Kafka branch is
  * exercised as a construction contract (SourcesSpec: the (format, options)
  * pair is built correctly, never loaded); the file branch runs end-to-end.
  */
sealed trait StreamSource {
  /** DataSource short name handed to `readStream.format`. */
  def format: String
  /** Full option map handed to the reader — the testable contract. */
  def options: Map[String, String]
  /** Per-trigger admission cap (the R12 bounded channel), if any. */
  def capPerTrigger: Option[Long]
}

/** A replayable directory of files (parquet/json/csv/...). */
final case class FileStreamSource(
    path: String,
    fileFormat: String = "parquet",
    schema: Option[StructType] = None,
    capPerTrigger: Option[Long] = None) extends StreamSource {
  def format: String = fileFormat
  def options: Map[String, String] =
    Map("path" -> path) ++
      capPerTrigger.map(c => "maxFilesPerTrigger" -> c.toString)
}

/** A Kafka subscription (production path; needs the spark-sql-kafka
  * connector on the classpath and a reachable broker at `.load()` time —
  * construction itself is broker-free and contract-tested). */
final case class KafkaStreamSource(
    bootstrapServers: String,
    topics: Seq[String],
    startingOffsets: String = "earliest",
    failOnDataLoss: Boolean = true,
    capPerTrigger: Option[Long] = None,
    extra: Map[String, String] = Map.empty) extends StreamSource {
  require(topics.nonEmpty, "KafkaStreamSource needs at least one topic")
  def format: String = "kafka"
  def options: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      capPerTrigger.map(c => "maxOffsetsPerTrigger" -> c.toString) ++
      extra
}

object StreamSource {

  /** The configured reader — format + every option applied, nothing loaded
    * yet (broker-free for Kafka). */
  def reader(spark: SparkSession, src: StreamSource): DataStreamReader = {
    val base = spark.readStream.format(src.format).options(src.options)
    src match {
      case FileStreamSource(_, _, Some(sc), _) => base.schema(sc)
      case _ => base
    }
  }

  /** Load the streaming DataFrame (file sources resolve their path from the
    * option map; Kafka contacts the broker here, not before). */
  def load(spark: SparkSession, src: StreamSource): DataFrame =
    reader(spark, src).load()
}
