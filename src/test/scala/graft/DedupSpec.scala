package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.Row

/** Invariants for the dedup operators whose hashes aren't SQL-reproducible
  * (SimHash; MinHash is additionally covered by the DuckDB oracle). */
class DedupSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map { case Row(a: Long, b: Long) => (a, b) }.toSet

  test("minhash-LSH finds exactly the exact-jaccard near-dup pairs") {
    val exact = pairs("d02_dedup_ngram_jaccard")
    val lsh = pairs("d03_dedup_minhash_lsh")
    assert(exact.nonEmpty, "fixture should contain injected near-dups")
    assert(lsh === exact)
  }

  test("prefix filtering finds exactly the exact-jaccard pairs (zero-miss guarantee)") {
    val exact = pairs("d02_dedup_ngram_jaccard")
    val pf = pairs("d13_dedup_jaccard_prefixfilter")
    assert(exact.nonEmpty, "fixture should contain injected near-dups")
    assert(pf === exact)
  }

  test("d18: the source-overlap matrix lands each planted pair in its exact cell") {
    val rows = SparkEntry.queries("d18_source_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty, "fixture should contain near-dup pairs")
    // the matrix partitions d03's pair set exactly: cell counts sum to it
    val total = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf).count()
    assert(rows.values.map(_._1).sum === total,
      "matrix cells must partition the verified pair set")
    rows.foreach { case ((a, b), (n, mj)) =>
      assert(a <= b, s"cells must be unordered-canonical: ($a, $b)")
      assert(n >= 1L && mj >= 800L && mj <= 1000L,
        s"cell ($a, $b) out of contract: n=$n max_j=$mj")
    }
  }

  test("prefix filtering is complete on adversarial corpora (dup floods + chains)") {
    import spark.implicits._
    // a flood of exact duplicates (worst prefix-bucket skew), a near-dup
    // chain that shares only a rare tail shingle region, and unrelated noise
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = (
      (1L to 8L).map(i => i -> base) ++                            // exact-dup flood
        Seq(20L -> (base + " omega"), 21L -> (base + " omicron"),  // near-dups of the flood
          30L -> "completely different words about distributed query engines here",
          31L -> "completely different words about distributed query engines there")
      ).toDF("doc_id", "text")
    val got = DedupQueries.prefixFilterNearDupPairs(spark, docs)
      .select("doc_a", "doc_b", "j_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // quadratic ground truth over the same shingle sets
    import graft.functions.TextFns
    import org.apache.spark.sql.functions._
    val sh = DedupQueries.shinglesOf(spark, docs)
    val want = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id", TextFns.jaccardMilli($"a.sh", $"b.sh").as("j"))
      .filter($"j" >= 800).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty && want.size > 30, s"ground truth should be rich, got ${want.size}")
    assert(got === want)
  }

  test("simhash pairs are bag-of-words near-dups and recall injected dups") {
    // simhash is order-insensitive: its ground truth is token-multiset
    // similarity, not the (order-sensitive) shingle jaccard of d02
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    import spark.implicits._
    val exact = pairs("d02_dedup_ngram_jaccard")
    val sim = pairs("d04_dedup_simhash")
    assert(sim.nonEmpty, "simhash should catch at least one injected near-dup")
    assert(sim.intersect(exact).nonEmpty,
      "simhash should recall some order-preserving near-dups too")
    val tokenSets = Tables.documents(spark, sf)
      .select($"doc_id", array_distinct(TextFns.tokens($"text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    sim.foreach { case (a, b) =>
      val j = tokenSets(a).intersect(tokenSets(b)).size.toDouble /
        tokenSets(a).union(tokenSets(b)).size
    assert(j >= 0.5, s"simhash pair ($a,$b) has low token jaccard $j")
    }
  }

  test("LSH embedding dedup is a subset of the exact anchor with high recall") {
    def vecPairs(name: String): Map[(Long, Long), Long] =
      SparkEntry.queries(name)(spark, sf)
        .select("vec_a", "vec_b", "cos_milli").collect()
        .map { case Row(a: Long, b: Long, c: Long) => (a, b) -> c }.toMap
    val exact = vecPairs("d05_dedup_embedding_cosine")
    val lsh = vecPairs("d06_dedup_embedding_lsh")
    assert(exact.nonEmpty, "fixture should contain embedding near-dups")
    // verification step guarantees: no false positives, identical scores
    assert(lsh.keySet.subsetOf(exact.keySet), "LSH emitted a non-near-dup pair")
    lsh.foreach { case (k, c) => assert(c === exact(k), s"score mismatch on $k") }
    // banding guarantees: high-cosine pairs are recalled almost surely
    val strong = exact.filter(_._2 >= 800L).keySet
    if (strong.nonEmpty) {
      val strongRecall = strong.count(lsh.contains).toDouble / strong.size
      assert(strongRecall >= 0.9, s"recall@cos>=0.8 = $strongRecall")
    }
    val recall = exact.keySet.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.5, s"overall recall = $recall")
  }

  test("minhash pipeline collapses exact duplicates before the band join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    // adversarial shape: a flood of identical docs (would blow up the band
    // self-join as m^2 if they reached it) + a near-dup + an unrelated doc
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = (Seq(3L -> (base + " tomorrow"), 4L -> "completely unrelated text about spark engines") ++
      (10L to 29L).map(_ -> base)).map { case (id, t) => (id, t) }
      .toDF("doc_id", "text")
    val got = DedupQueries.minhashNearDupPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: brute-force shingle jaccard over all pairs
    val sh = docs.select($"doc_id", TextFns.shingles($"text", 3).as("sh"))
    val expected = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        TextFns.jaccardMilli($"a.sh", $"b.sh").as("j"))
      .filter($"j" >= 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.exists(_._3 === 1000L), "fixture must contain exact dups")
    assert(got === expected)
  }

  test("cluster labels: pointer jumping converges a long chain in O(log d) rounds") {
    import spark.implicits._
    // 40-node path graph: diameter 39 — plain min-label propagation needs
    // 39 rounds; pointer jumping reaches distance ~2^r after r rounds
    val docs = (0L until 40L).toDF("doc_id")
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupQueries.clusterLabels(docs, chain, maxRounds = 8,
        localFoldMaxEdges = -1L) // the distributed loop is the test subject
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 40)
    assert(labels.values.forall(_ === 0L), s"all nodes must join cluster 0: $labels")
  }

  test("cluster labels fail loudly when the round cap is hit before convergence") {
    import spark.implicits._
    val docs = (0L until 10L).toDF("doc_id")
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      DedupQueries.clusterLabels(docs, chain, maxRounds = 1,
        localFoldMaxEdges = -1L).collect() // round cap is a distributed-loop contract
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("cluster labels: tiny round caps still converge on already-tight graphs") {
    import spark.implicits._
    // the rounds<2 count-skip must not leak its forced changed=1 into the
    // post-loop convergence require when maxRounds <= 2: an edge-free
    // graph is converged from the start (cap=1 must accept it), and a
    // single edge settles in round 1 (cap=2 must accept it)
    val docs = (0L until 4L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val isolated = DedupQueries.clusterLabels(docs, noPairs, maxRounds = 1,
        localFoldMaxEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(isolated === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    val onePair = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val labels = DedupQueries.clusterLabels(docs, onePair, maxRounds = 2,
        localFoldMaxEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L))
  }

  test("identical texts get identical minhash signatures and simhash") {
    import spark.implicits._
    import graft.functions.TextFns
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different document about spark engines")).toDF("id", "text")
    val sigs = df.select($"id",
        DedupQueries.minhashSig(TextFns.shingles($"text", 3)).as("sig"),
        DedupQueries.simhash(TextFns.tokens($"text")).as("sh"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L)._1 !== sigs(3L)._1)
  }

  test("incremental dedup equals the full pair set restricted to the new slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val full = DedupQueries.minhashNearDupPairs(spark, docs)
      .select($"doc_a", $"doc_b", $"j_milli")
      .as[(Long, Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 % 10 == 7 || p._2 % 10 == 7)
    val inc = DedupQueries.incrementalNearDupPairs(
        spark, docs, pmod($"doc_id", lit(10)) === 7)
      .as[(Long, Long, Long)].collect().toSet
    // the asymmetric band join must find EXACTLY the touching-new pairs —
    // no history-vs-history leakage, no lost new pairs
    assert(inc === expected)
    assert(inc.nonEmpty)
  }

  test("d16 savings: token totals agree with t03 and kept never exceeds total") {
    import org.apache.spark.sql.functions._
    val savings = SparkEntry.queries("d16_dedup_savings")(spark, sf).collect()
    assert(savings.nonEmpty)
    val t03 = SparkEntry.queries("t03_token_counts")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    savings.foreach { r =>
      assert(r.getLong(3) === t03(r.getString(0)),
        s"${r.getString(0)}: d16 total tokens must equal t03's whitespace totals")
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L)
    }
    // the fixture plants near-dups, so SOME savings must exist overall
    assert(savings.map(r => r.getLong(3) - r.getLong(4)).sum > 0L,
      "near-dup fixture must yield nonzero token savings")
  }

  test("d15 fuzzy join: deletion blocking equals brute force on every edit type") {
    import spark.implicits._
    // one planted variant per edit kind, plus distance-2 words that must
    // NOT pair: blocked result == brute-force all-pairs levenshtein <= 1
    val words = Seq(
      "spark" -> 100L, "spork" -> 2L,   // substitution
      "sparky" -> 3L,                   // insertion (vs spark)
      "spak" -> 1L,                     // deletion (vs spark)
      "table" -> 50L, "cable" -> 40L,   // substitution pair
      "zzzz" -> 9L)                     // isolated
      .toDF("w", "cnt")
    val blocked = DedupQueries.fuzzyWordPairs(words)
      .select($"word_a", $"word_b").as[(String, String)].collect().toSet
    val vocab = words.select($"w").as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(blocked === brute)
    assert(blocked === Set(("spak", "spark"), ("spark", "spork"),
      ("spark", "sparky"), ("cable", "table")))
  }
}
