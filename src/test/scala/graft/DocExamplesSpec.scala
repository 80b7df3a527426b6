package graft

import graft.dsl.{Interpreter, SP}
import graft.functions.{TextFns, VectorFns}
import graft.operators.{DedupQueries, SkewJoin}

/** Docs-as-tests, the Spark analogue of the reference's
  * doc-test-per-public-API policy (reference CONTRIBUTING.md:28-31: every
  * public item carries a runnable example). Scala has no built-in doctest
  * runner, so each scaladoc `{{{ }}}` example in the public API is mirrored
  * here VERBATIM — one test per example, named after the API it documents.
  * If an example in the docs drifts from reality, this suite goes red.
  */
class DocExamplesSpec extends SparkSpec {

  import spark.implicits._

  test("SP.fsm scaladoc example") {
    val counter = SP.fsm(0) { (n: Int, e: Char) =>
      if (e == 'x') (n + 1, Nil) else (0, Seq(n))
    }
    assert(Interpreter.evalN(counter, "xx.x.".toSeq) === Vector(2, 1))
  }

  test("Interpreter.evalN scaladoc example") {
    val evens = SP.compose(SP.filter((n: Int) => n % 2 == 0), SP.map((n: Int) => n * 10))
    assert(Interpreter.evalN(evens, Seq(1, 2, 3, 4)) === Vector(20, 40))

    val fib = SP.generate[Unit, Long, (Long, Long)](s => (s._1, (s._2, s._1 + s._2)), (0L, 1L))
    assert(Interpreter.evalN(fib, Seq.empty[Unit], max = 6) ===
      Vector(0L, 1L, 1L, 2L, 3L, 5L))
  }

  test("SkewJoin.saltedEquiJoin scaladoc example") {
    val fact  = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val build = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val salted = SkewJoin.saltedEquiJoin(fact, build, "k", salts = 4)
    assert(salted.orderBy("k", "v").collect().toSeq ===
      fact.join(build, "k").orderBy("k", "v").collect().toSeq)
  }

  test("VectorFns.cosineMilli scaladoc example") {
    val df = Seq((Array(1f, 0f), Array(1f, 0f)), (Array(1f, 0f), Array(0f, 1f)))
      .toDF("a", "b")
    assert(df.select(VectorFns.cosineMilli($"a", $"b")).as[Long].collect().toSeq ===
      Seq(1000L, 0L))
  }

  test("DedupQueries.clusterLabels scaladoc example") {
    val docs  = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    assert(DedupQueries.clusterLabels(docs, pairs).as[(Long, Long)].collect().toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("TextFns.tokens scaladoc example") {
    assert(Seq("  Hello   WORLD ").toDF("text")
      .select(TextFns.tokens($"text")).as[Seq[String]].head === Seq("hello", "world"))
  }

  test("TextQueries.repeatedSpans scaladoc example") {
    import graft.operators.TextQueries
    val span = (1 to 20).map("d" + _).mkString(" ")
    val docs = Seq((1L, s"a b c $span", "en"), (2L, s"$span x y", "en"))
      .toDF("doc_id", "text", "lang")
    assert(TextQueries.repeatedSpans(docs)
      .select("doc_a", "doc_b", "max_span_tokens")
      .as[(Long, Long, Long)].head === ((1L, 2L, 20L)))
  }

  test("TextQueries.modelScores scaladoc example") {
    import graft.operators.TextQueries
    val r = TextQueries.modelScores(
      Seq((7L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")).head
    assert(r.getLong(2) == 3L &&
      r.getLong(4) == math.floor(r.getLong(3) * 1000.0 / 3).toLong)
  }

  test("ExtraRelationalQueries.mergeUpsert scaladoc example") {
    import graft.operators.ExtraRelationalQueries
    val target = Seq((1L, 100L), (2L, 200L)).toDF("k", "tval")
    val deltas = Seq((2L, -50L), (9L, 700L)).toDF("k", "delta")
    assert(ExtraRelationalQueries.mergeUpsert(target, deltas)
      .orderBy("k").collect().map(_.toSeq).toSeq ===
      Seq(Seq(1L, "unchanged", 100L), Seq(2L, "updated", 150L),
        Seq(9L, "inserted", 700L)))
  }

  test("TextQueries.weightedSample scaladoc example") {
    import graft.operators.TextQueries
    val docs = Seq((1L, "x", "en", 1L), (2L, "x", "en", 1000L))
      .toDF("doc_id", "text", "lang", "n_chars")
    assert(TextQueries.weightedSample(docs, 1)
      .select($"doc_id").as[Long].head() === 2L)
  }

  test("ExtraRelationalQueries.olsFit scaladoc example") {
    import graft.operators.ExtraRelationalQueries
    val line = (0L until 10L).map(x => ("a", x, 3 * x + 7)).toDF("seg", "x", "y")
    val r = ExtraRelationalQueries.olsFit(line).head()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((3000000L, 7000L, 1000L)))
  }

  test("CountMin scaladoc example") {
    import graft.functions.CountMin
    val sk = spark.createDataset(Seq(1L, 1L, 1L, 2L))
      .select(new CountMin().toColumn).head()
    assert(CountMin.estimate(sk, 1L) >= 3L)
    assert(CountMin.estimate(sk, 2L) >= 1L)
  }

  test("ExtraRelationalQueries.kmCurve scaladoc example") {
    import graft.operators.ExtraRelationalQueries
    val lt = Seq((1L, true), (1L, true), (2L, true)).toDF("t", "churned")
    assert(ExtraRelationalQueries.kmCurve(lt)
      .select($"t", $"surv_milli").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 333L), (2L, 0L)))
  }

  test("ExtraRelationalQueries.ksReport scaladoc example") {
    import graft.operators.ExtraRelationalQueries
    val sup = Seq((1L, 4L, 0L), (2L, 6L, 0L), (10L, 0L, 5L)).toDF("v", "c1", "c2")
    val r = ExtraRelationalQueries.ksReport(sup).head()
    assert(r.getLong(2) === 1000L && r.getLong(3) === 2L)
  }

  test("ExtraRelationalQueries.isotonicFit scaladoc example") {
    import graft.operators.ExtraRelationalQueries
    val ser = Seq((1L, 1L, 4000L), (2L, 1L, 2000L), (3L, 1L, 9000L)).toDF("f", "w", "sc")
    assert(ExtraRelationalQueries.isotonicFit(ser)
      .select("iso_milli").as[Long].collect().toSeq ===
      Seq(3000000L, 3000000L, 9000000L))
  }

  test("DedupQueries.fuzzyWordPairs scaladoc example") {
    val v = Seq(("red", 10L), ("rod", 3L), ("zzzz", 1L)).toDF("w", "cnt")
    assert(DedupQueries.fuzzyWordPairs(v).select("word_a", "word_b")
      .as[(String, String)].collect().toSeq === Seq(("red", "rod")))
  }

  test("ExtraRelationalQueries.seasonalBacktest scaladoc example") {
    import graft.operators.ExtraRelationalQueries
    import org.apache.spark.sql.functions.to_timestamp
    val days = Seq(("2024-01-01", 500L), ("2024-01-08", 500L))
      .toDF("d", "rev_c").select(to_timestamp($"d").as("day"), $"rev_c")
    assert(ExtraRelationalQueries.seasonalBacktest(days)
      .select($"dow", $"mae_c").as[(Long, Long)].head() === ((0L, 0L)))
  }

  test("TextQueries.cdcChunks scaladoc example") {
    import graft.operators.TextQueries
    import org.apache.spark.sql.functions.{concat_ws, collect_list}
    val one = Seq((1L, "The quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    assert(TextQueries.cdcChunks(one)
      .agg(concat_ws("", collect_list($"chunk"))).as[String].head() ===
      "the quick brown fox jumps over the lazy dog")
  }
}
