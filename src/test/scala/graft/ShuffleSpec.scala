package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured shuffle-byte gates: the scale story of the dedup family is
  * "only digests/hashes cross the wire, never text" — these tests attach a
  * listener, run the query, and assert actual shuffle WRITE bytes against a
  * per-row budget. A regression that starts shuffling document text (or
  * shingle strings again) blows the budget by an order of magnitude, so
  * the bounds are loose enough for JVM noise and tight enough to catch
  * exactly that class of bug.
  */
class ShuffleSpec extends SparkSpec {

  import spark.implicits._

  /** Total shuffle write bytes across all stages of one action. */
  private def shuffleBytes(df: DataFrame): (Long, Long) = {
    var bytes = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes += m.shuffleWriteMetrics.bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = df.count()
      // give the async listener bus a moment to drain task-end events
      var waited = 0
      while (waited < 10000 && bytes == 0L) { Thread.sleep(200); waited += 200 }
      Thread.sleep(500)
      (bytes, n)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("d01 exact dedup shuffles digests, not documents") {
    val docs = Tables.documents(spark, sf)
    val textBytes = docs.select(sum(length($"text"))).as[Long].head()
    val (bytes, rows) = shuffleBytes(SparkEntry.queries("d01_dedup_exact")(spark, sf))
    assert(rows > 0)
    // content_key (32-char md5) + ids + row overhead lands well under 200
    // bytes/doc; shuffling the text itself would exceed the corpus text size
    val docsN = docs.count()
    assert(bytes < math.max(200L * docsN, 1L),
      s"d01 shuffled $bytes bytes for $docsN docs — is text crossing the wire?")
    assert(bytes < textBytes,
      s"d01 shuffle ($bytes B) exceeds total corpus text ($textBytes B)")
  }

  test("t14 boilerplate spans shuffle hashed shingle keys, not shingle strings") {
    val docs = Tables.documents(spark, sf)
    val (bytes, rows) = shuffleBytes(
      SparkEntry.queries("t14_boilerplate_spans")(spark, sf))
    assert(rows > 0)
    // ~70-byte shingle strings would cost >70 B per shingle; hashed keys
    // (8 B + ids + agg state) stay under ~48 B per shingle
    val nShingles = docs
      .select(greatest(size(split(graft.functions.TextFns.normalize($"text"), " ")) - 7, lit(1)))
      .as[Int].collect().map(_.toLong).sum
    assert(bytes < 48L * nShingles + (1L << 20),
      s"t14 shuffled $bytes bytes for $nShingles shingles — strings back on the wire?")
    spark.catalog.clearCache()
  }

  test("d13 candidate stages shuffle hashed keys; verify moves O(corpus) arrays, bounded") {
    val docs = Tables.documents(spark, sf)
    val textBytes = docs.select(sum(length($"text"))).as[Long].head()
    val (bytes, rows) = shuffleBytes(
      SparkEntry.queries("d13_dedup_jaccard_prefixfilter")(spark, sf))
    assert(rows > 0)
    // the candidate stages (df agg, prefix ranking, candidate join) move
    // only 8-byte hashed keys; the remaining heavy traffic is the exact
    // verify re-partitioning the shingle-ARRAY table by each join side —
    // O(corpus) like d03's verify, ~2 x (3-gram arrays ~ 3x text). Budget
    // 16x text: re-introducing shingle STRINGS into the candidate stages
    // (3 more corpus-scale string exchanges) or a quadratic candidate set
    // blows it; the measured value today is ~13x.
    assert(bytes < 16L * textBytes + (1L << 20),
      s"d13 shuffled $bytes bytes vs $textBytes corpus text bytes — " +
        "strings in the candidate stages, or candidate blowup?")
    spark.catalog.clearCache()
  }
}
