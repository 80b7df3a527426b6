package graft

import graft.operators.SqlSurfaceQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for the modern-SQL-surface rows (q56/q57/q58): values the oracle
  * will re-check at sf0.01, plus the PLAN properties that make each row a
  * scale story and not just a parser story.
  */
class SqlSurfaceSpec extends SparkSpec {
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q56 recursive CTE: 5 per-region chains covering all 25 nations") {
    val rows = q("q56_recursive_cte").collect()
    assert(rows.length == 5)
    // every chain walks its whole region: lengths sum to the nation count
    assert(rows.map(_.getLong(1)).sum == 25L)
    // depth = chain_len - 1 (the walk visits each nation exactly once)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1) - 1))
  }

  test("q56 recursive CTE executes via Spark's native UnionLoop") {
    val df = q("q56_recursive_cte")
    // The loop node lives in the optimized logical plan; physical execution
    // unrolls it, so gate on the analyzed plan containing a recursive CTE.
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("UnionLoop") || plan.contains("CTERelationDef"),
      s"expected a recursive CTE node in:\n$plan")
  }

  test("q57 lateral top-k: exactly <=3 rows per nation, correctly ordered") {
    val df = q("q57_lateral_topk")
    val perNation = df.groupBy("nation").count().collect()
    assert(perNation.nonEmpty)
    assert(perNation.forall(_.getLong(1) <= 3))
    // per-nation balances are non-increasing in result order
    val rows = df.collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val bals = rs.map(_.getLong(2)).toSeq
      assert(bals == bals.sorted(Ordering[Long].reverse))
    }
  }

  test("q57 lateral decorrelates: no nested-loop join, no cartesian") {
    val p = physical(q("q57_lateral_topk"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q58 variant round trip equals direct computation on raw columns") {
    import spark.implicits._
    val viaVariant = q("q58_variant_extract").collect().toSeq
    val direct = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(
        sum(get_json_object($"props", "$.k").cast("long")).as("k_sum"),
        sum(floor($"value" * 100).cast("long")).as("cents_sum"),
        countDistinct($"user_id").as("users"))
      .orderBy($"event_type")
      .collect().toSeq
    assert(viaVariant.map(_.toSeq) == direct.map(_.toSeq))
  }
}
