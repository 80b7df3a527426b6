package graft

import org.apache.spark.sql.functions._

/** Cross-query invariants for the corpus-hygiene operators (t06-t08) —
  * properties the per-query DuckDB oracle can't see because they relate
  * DIFFERENT queries' outputs or whole-group conservation laws. */
class TextSpec extends SparkSpec {

  import spark.implicits._

  test("t06: split is exhaustive and near the 90/10 target") {
    val rows = SparkEntry.queries("t06_split_stratified")(spark, sf)
      .select($"split", $"n_docs").as[(String, Long)].collect()
    val total = rows.map(_._2).sum
    val train = rows.filter(_._1 == "train").map(_._2).sum
    assert(total === Tables.documents(spark, sf).count())
    val frac = train.toDouble / total
    // hash split over 500 docs: binomial sd ~1.3% — allow 4 sigma
    assert(frac > 0.84 && frac < 0.96, s"train fraction $frac")
  }

  test("t07: heldout counts agree with t06 and contamination is bounded") {
    val t06 = SparkEntry.queries("t06_split_stratified")(spark, sf)
      .filter($"split" === "heldout")
      .select($"lang", $"n_docs").as[(String, Long)].collect().toMap
    val t07 = SparkEntry.queries("t07_contamination")(spark, sf)
      .select($"lang", $"n_heldout", $"n_contaminated")
      .as[(String, Long, Long)].collect()
    assert(t07.map(r => r._1 -> r._2).toMap === t06)
    t07.foreach { case (lang, held, cont) =>
      assert(cont >= 0 && cont <= held, s"$lang: $cont of $held")
    }
  }

  test("t08: packing conserves tokens and fills every non-tail chunk exactly") {
    val chunks = SparkEntry.queries("t08_pack_context")(spark, sf)
      .select($"lang", $"shard", $"chunk", $"n_tokens")
      .as[(String, Long, Long, Long)].collect()
    val totals = Tables.documents(spark, sf)
      .groupBy($"lang").agg(
        sum(size(graft.functions.TextFns.tokens($"text")).cast("long")).as("t"))
      .as[(String, Long)].collect().toMap
    // conservation: chunked tokens per lang == raw tokens per lang
    val byLang = chunks.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(byLang === totals)
    // density: within each (lang, shard), every chunk but the last holds
    // exactly the 512-token budget (packing leaves no internal gaps), and
    // chunk ids are contiguous from 0
    chunks.groupBy(c => (c._1, c._2)).foreach { case ((lang, shard), cs) =>
      val sorted = cs.sortBy(_._3)
      assert(sorted.map(_._3) === sorted.indices.map(_.toLong),
        s"$lang/$shard: chunk ids not contiguous")
      sorted.init.foreach { c =>
        assert(c._4 === 512L, s"$lang/$shard chunk ${c._3}: ${c._4} tokens")
      }
      assert(sorted.last._4 <= 512L)
    }
  }
}
