package graft

import graft.operators.TextQueries
import graft.streaming.StreamIngest
import org.apache.spark.sql.catalyst.expressions.{In, InSet}

/** Plan-shape gates for the composed streaming ingestion twin's pair-mining
  * seam. Round 5 shipped a driver-side `collect()` of every new doc_id per
  * micro-batch, baked back into the plan as an `isin` literal list — O(new
  * docs) through the driver and an O(n)-literal Catalyst expression. The
  * fix threads the new slice through [[graft.operators.DedupQueries
  * .incrementalNearDupPairs]]' band rows as a semi-join on a doc_id FRAME.
  * These gates keep it that way: the mining plan must contain a semi-join
  * and ZERO In/InSet expressions (the only way a collected id list can
  * re-enter), and a 10^4-new-doc batch must fold through the same plan
  * shape and still equal the one-shot batch pipeline. */
class StreamIngestPlanSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).as[Long].map(ScaleCorpus.doc _).toDF("doc_id", "text")

  private def admittedOf(docs: org.apache.spark.sql.DataFrame) =
    TextQueries.admissionFeatures(docs)
      .join(docs.select($"doc_id", $"text"), Seq("doc_id"))
      .filter(TextQueries.admissionGate)

  test("minePairs reaches the band rows via a semi-join: no In/InSet literal id list in the plan") {
    val docs = corpus(200)
    val admitted = admittedOf(docs)
    val newKeys = admitted.filter($"doc_id" >= 100).select($"content_key")
    val plan = StreamIngest.minePairs(admitted, newKeys).queryExecution.optimizedPlan
    val ins = plan.collect { case n =>
      n.expressions.flatMap(_.collect { case i: In => i; case i: InSet => i })
    }.flatten
    assert(ins.isEmpty,
      s"mining plan bakes a collected literal id list back in:\n${ins.mkString("\n")}")
    assert(plan.toString.contains("LeftSemi"),
      s"expected the new slice to reach the band rows via a semi-join:\n$plan")
  }

  test("a 10^4-new-doc batch folds collect-free and equals the one-shot batch pipeline") {
    // every doc in the first fold is new — the exact shape round 5's seam
    // would have collected 10^4 ids for. ScaleCorpus docs: 40 tokens,
    // near-unique words (gate passes); every 10th is a near-dup of its
    // predecessor, so survivors = 10^4 - 10^3 groups.
    val docs = corpus(10000)
    val st = new StreamIngest.IngestState(spark)
    st.merge(docs, 0L)
    val stream = st.packed.collect().toSeq
    val batch = StreamIngest.ingestBatch(docs).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream === batch)
  }
}
