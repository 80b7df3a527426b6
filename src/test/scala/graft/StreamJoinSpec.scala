package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream and stream-static joins (SURVEY.md §2.2 joins): watermarked
  * inner join of two event streams within a time bound equals the batch
  * equi-join with the same time predicate. */
class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  test("watermarked stream-stream join equals batch time-bound join") {
    implicit val sq = spark.sqlContext
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq.sortBy(_._1)
    val purchases = events.filter(_._4 == "purchase")
    val errors = events.filter(_._4 == "error")

    val msP = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val msE = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val pDf = msP.toDF().toDF("p_id", "p_ts", "p_user").withWatermark("p_ts", "1 hour")
    val eDf = msE.toDF().toDF("e_id", "e_ts", "e_user").withWatermark("e_ts", "1 hour")
    // error within 30 minutes after a purchase by the same user
    val joined = pDf.join(eDf,
      $"p_user" === $"e_user" && $"e_ts" >= $"p_ts" &&
        $"e_ts" <= $"p_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"p_id", $"e_id")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      msP.addData(purchases.map(p => (p._1, p._2, p._3)))
      msE.addData(errors.map(e => (e._1, e._2, e._3)))
      q.processAllAvailable()
      val streamed = spark.table("ss_join").as[(Long, Long)].collect().sorted.toVector

      val pB = purchases.toDF("p_id", "p_ts", "p_user", "t").drop("t")
      val eB = errors.toDF("e_id", "e_ts", "e_user", "t").drop("t")
      val batch = pB.join(eB,
        $"p_user" === $"e_user" && $"e_ts" >= $"p_ts" &&
          $"e_ts" <= $"p_ts" + expr("INTERVAL 30 MINUTES"))
        .select($"p_id", $"e_id").as[(Long, Long)].collect().sorted.toVector
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static join: streaming events enriched from the customer table") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val cust = Tables.customer(spark, sf)
    val joined = ms.toDF().toDF("user_id")
      .join(cust, $"user_id" === $"c_custkey")
      .select($"user_id", $"c_mktsegment")
    val q = joined.writeStream.format("memory").queryName("ss_static")
      .outputMode("append").start()
    try {
      ms.addData(0L, 1L, 2L)
      q.processAllAvailable()
      val got = spark.table("ss_static").count()
      assert(got === 3L)
    } finally q.stop()
  }
}
