package graft

/** Plan linter: one regression gate over EVERY benchmarked query's physical
  * plan, so a plan degradation (a join losing its equi keys and falling
  * back to a nested-loop scan, a cartesian product sneaking in behind a
  * refactor, a driver-side limit mid-pipeline) fails CI instead of
  * becoming a 100 TB incident. This automates the per-round manual plan
  * audit; PlanQualitySpec keeps the sharper per-query shape assertions. */
class PlanLintSpec extends SparkSpec {

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * q21 is a genuine interval join (no equi key exists; the broadcast side
    * is a constant-size bucket table), s01/s05 score a constant-size
    * broadcast query set against the streaming corpus (the BNLJ is the
    * algorithm — brute force and compressed-domain coarse scan; the
    * LSH/IVF variants are the pruned path); t12 and s10 join corpus stats
    * — a 1-row broadcast scalar — onto the doc-term table (constant-size
    * build side by construction); s14 is s01's evaluation twin (exact
    * recall ground truth REQUIRES the brute-force ranking — the pruned
    * paths are what it measures). Everything else must stay equi-join
    * shaped. */
  private val bnljOk = Set("q21_range_join_buckets", "s01_ann_bruteforce_topk",
    "s05_ann_projected_rerank", "s07_mmr_diverse_topk", "t12_unigram_surprisal",
    "s10_bm25_retrieval", "s14_trunc_recall",
    // q69, t29, t30 join a 1-row corpus stat onto vocab-/strata-sized
    // tables — t12/s10's stats-broadcast pattern; PlanQualitySpec
    // separately caps q69 at ONE such join
    "q69_market_basket", "t29_keywords", "t30_neyman_allocation",
    // s17 embeds s01's brute-force ground truth — recall evaluation
    // REQUIRES the exact ranking it measures against
    "s17_recall_harness",
    // s20 fuses s10's BM25 (1-row stats broadcast) with s01's exact
    // cosine side (broadcast query set, non-equi self-exclusion) — both
    // established bnljOk patterns composed
    "s20_hybrid_rrf",
    // s21 keeps s10's 1-row stats broadcast on the lexical leg; its
    // vector leg is the s02 bucket EQUI-join (no corpus NLJ — that is
    // the point of the indexed swap)
    "s21_hybrid_rrf_indexed",
    // q103 broadcasts two 1-row frames (the global end-date and the
    // 12-cell quintile-boundary row) onto the customer profile — the
    // same stats-broadcast pattern; PlanQualitySpec gates that no window
    // ever sorts the customer-sized aggregate
    "q103_rfm_value_segments",
    // t26's zero-straddle proof is a 1-row broadcast scalar crossed onto
    // the per-lang report (it used to be a standalone driver count that
    // ran the label pipeline twice) — the stats-broadcast pattern again
    "t26_cluster_split")

  for (q <- SparkEntry.allDefs.filter(_.benchmark)) {
    test(s"${q.name}: no cartesian product, no stray nested-loop join, no mid-plan collect") {
      val df = q.fn(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"cartesian product in ${q.name}:\n$plan")
      if (!bnljOk(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"nested-loop join in ${q.name} (join keys lost?):\n$plan")
      // CollectLimit funnels rows to the driver: fine as the root operator
      // of a deliberately-limited result, fatal anywhere below it
      val lines = plan.linesIterator.toSeq
      val midCollect = lines.zipWithIndex.exists {
        case (l, i) => i > 0 && l.contains("CollectLimit")
      }
      assert(!midCollect, s"mid-plan CollectLimit in ${q.name}:\n$plan")
      spark.catalog.clearCache()
    }
  }
}
