package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lower

class SimilaritySpec extends SparkSpec {

  private def topk(name: String): Map[Long, Seq[(Long, Long)]] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "rank", "vec_id").collect()
      .map { case Row(q: Long, r: Long, v: Long) => (q, r, v) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._2, t._3)).toSeq).toMap

  test("brute-force top-k is complete and correctly ranked") {
    val bf = topk("s01_ann_bruteforce_topk")
    assert(bf.keySet === Set(0L, 1L, 2L, 3L, 4L))
    bf.values.foreach { nbrs =>
      assert(nbrs.map(_._1) === (1L to 10L))
      // no self-matches: query ids are 0..4, ranked neighbors must differ
    }
  }

  test("LSH ANN recalls a meaningful fraction of brute-force neighbors") {
    val bf = topk("s01_ann_bruteforce_topk")
    val lsh = topk("s02_ann_lsh_bucketed")
    val recalls = bf.map { case (q, nbrs) =>
      val bfSet = nbrs.map(_._2).toSet
      val lshSet = lsh.getOrElse(q, Seq.empty).map(_._2).toSet
      lshSet.intersect(bfSet).size.toDouble / bfSet.size
    }
    val mean = recalls.sum / recalls.size
    // sign-LSH with 8 planes, hamming<=3 neighborhood: recall is partial by
    // design; assert it beats random chance by a wide margin
    assert(mean >= 0.2, s"mean recall@10 = $mean")
  }

  test("IVF ANN recalls a meaningful fraction of brute-force neighbors") {
    val bf = topk("s01_ann_bruteforce_topk")
    val ivf = topk("s03_ann_ivf")
    val recalls = bf.map { case (q, nbrs) =>
      val bfSet = nbrs.map(_._2).toSet
      val ivfSet = ivf.getOrElse(q, Seq.empty).map(_._2).toSet
      ivfSet.intersect(bfSet).size.toDouble / bfSet.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe=16 of 64 cells on weak-signal fixture data; floor well above
    // the random baseline for a ~25% corpus scan
    assert(mean >= 0.3, s"mean recall@10 = $mean")
  }

  test("k-means IVF recalls a meaningful fraction of brute-force neighbors") {
    val bf = topk("s01_ann_bruteforce_topk")
    val km = topk("s04_ann_ivf_kmeans")
    val recalls = bf.map { case (q, nbrs) =>
      val bfSet = nbrs.map(_._2).toSet
      val kmSet = km.getOrElse(q, Seq.empty).map(_._2).toSet
      kmSet.intersect(bfSet).size.toDouble / bfSet.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe=4 of 16 learned cells (~25% corpus scan) on weak-signal data
    assert(mean >= 0.3, s"mean recall@10 = $mean")
  }

  test("k-means strictly improves the codebook over its hash-sample seeds") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    // Lloyd's objective (total squared distance to the assigned centroid)
    // must drop from the raw seeds to the trained codebook — the learning
    // is real, not just deterministic
    def objective(cb: Array[Array[Long]]): Double = {
      val bc = spark.sparkContext.broadcast(cb)
      Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])]
        .map { case (_, emb) =>
          val m = emb.map(x => math.floor(x.toDouble * 1000.0).toLong)
          bc.value.map { c =>
            var d = 0.0; var j = 0
            while (j < m.length) { val x = (m(j) - c(j)).toDouble; d += x * x; j += 1 }
            d
          }.min
        }.reduce(_ + _)
    }
    val e = Tables.embeddings(spark, sf)
    val seeds = SimilarityQueries.kmeansCodebook(spark, e, iters = 0)
    val trained = SimilarityQueries.kmeansCodebook(spark, e)
    assert(seeds.length === SimilarityQueries.KmK)
    assert(trained.length === SimilarityQueries.KmK)
    val (o0, o3) = (objective(seeds), objective(trained))
    assert(o3 < o0 * 0.9, s"k-means did not improve: seeds=$o0 trained=$o3")
  }

  test("projected re-rank recalls most brute-force neighbors") {
    val bf = topk("s01_ann_bruteforce_topk")
    val pr = topk("s05_ann_projected_rerank")
    val recalls = bf.map { case (q, nbrs) =>
      val bfSet = nbrs.map(_._2).toSet
      val prSet = pr.getOrElse(q, Seq.empty).map(_._2).toSet
      prSet.intersect(bfSet).size.toDouble / bfSet.size
    }
    val mean = recalls.sum / recalls.size
    // the coarse stage scans everything (in 16 of 64 dims) and re-ranks 50
    // exactly, so recall should be well above the pruned variants
    assert(mean >= 0.5, s"mean recall@10 = $mean")
  }

  test("int8 quantization error respects the theoretical bound") {
    // symmetric round-to-nearest: |x - q*scale/127| <= scale/254 per
    // component; scale_milli is floored so bound with scale_milli + 1,
    // plus 1 micro for the error column's own floor
    SparkEntry.queries("s06_embedding_quantize_int8")(spark, sf)
      .collect().foreach { r =>
        val scaleMilli = r.getLong(1)
        val maxErrMicro = r.getLong(2)
        assert(maxErrMicro <= (scaleMilli + 1L) * 1000L / 254L + 1L,
          s"vec ${r.getLong(0)}: max err $maxErrMicro vs scale $scaleMilli")
      }
  }

  test("MMR first pick is the relevance argmax and picks are distinct per query") {
    import spark.implicits._
    import graft.operators.DedupQueries
    val mmr = SparkEntry.queries("s07_mmr_diverse_topk")(spark, sf)
      .select($"query_id", $"pick_rank", $"vec_id", $"rel")
      .as[(Long, Long, Long, Long)].collect()
    val s01 = SparkEntry.queries("s01_ann_bruteforce_topk")(spark, sf)
      .select($"query_id", $"rank", $"vec_id")
      .as[(Long, Long, Long)].collect()
    val byQ = mmr.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, picks) =>
      assert(picks.length === 5)
      assert(picks.map(_._3).distinct.length === 5, s"query $q repeated a pick")
      // pick 1 ignores diversity: must equal brute-force rank 1
      val top1 = s01.find(r => r._1 == q && r._2 == 1L).get._3
      assert(picks.minBy(_._2)._3 === top1, s"query $q first pick")
    }
    // diversity: MMR's picks are no more self-similar than the plain top-5,
    // summed over queries (the objective it greedily optimizes)
    val embs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def pairSim(ids: Seq[Long]): Long =
      ids.combinations(2).map(p => DedupQueries.cosMilliOf(embs(p(0)), embs(p(1)))).sum
    val mmrSim = byQ.map { case (_, picks) => pairSim(picks.map(_._3).toSeq) }.sum
    val topSim = s01.filter(_._2 <= 5).groupBy(_._1)
      .map { case (_, rs) => pairSim(rs.map(_._3).toSeq) }.sum
    assert(mmrSim <= topSim, s"MMR self-similarity $mmrSim > top-5 $topSim")
  }

  test("k-means codebook is independent of input partitioning") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    // the determinism contract that makes a LEARNED codebook
    // oracle-checkable: integer sums are associative, so however the
    // corpus is partitioned the trained centroids are bit-identical
    val e = Tables.embeddings(spark, sf)
    val one = SimilarityQueries.kmeansCodebook(spark, e.repartition(1))
    val many = SimilarityQueries.kmeansCodebook(spark, e.repartition(7, $"vec_id"))
    assert(one.map(_.toSeq).toSeq === many.map(_.toSeq).toSeq)
  }

  test("IVF codebook size is constant regardless of corpus size") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    def corpus(n: Int) = spark.range(n).as[Long]
      .map(i => (i, Array.tabulate(8)(j => ((i % 7) + j).toFloat)))
      .toDF("vec_id", "embedding")
    val small = SimilarityQueries.ivfCentroids(spark, corpus(300))
    val big = SimilarityQueries.ivfCentroids(spark, corpus(3000))
    // the scale contract: the collect-to-driver is O(k), k pinned — a 10x
    // corpus must NOT grow the codebook (the round-2 scheme grew it n/37)
    assert(small.length === SimilarityQueries.IvfK)
    assert(big.length === SimilarityQueries.IvfK)
  }

  test("PQ ADC recalls a meaningful fraction of brute-force neighbors") {
    val bf = topk("s01_ann_bruteforce_topk")
    val pq = topk("s08_ann_pq_adc")
    pq.values.foreach(nbrs => assert(nbrs.map(_._1) === (1L to 10L)))
    val recalls = bf.map { case (q, nbrs) =>
      val bfSet = nbrs.map(_._2).toSet
      val pqSet = pq.getOrElse(q, Seq.empty).map(_._2).toSet
      pqSet.intersect(bfSet).size.toDouble / bfSet.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ ADC mean recall@10 = $mean%.2f")
    // 4-bit codes (16 codewords/subspace) on weak-signal random fixture
    // data: the approximation is coarse by design (0.28 measured at
    // sf0.01); assert it beats the ~1.3% random-guess baseline widely
    assert(mean >= 0.1, s"mean recall@10 = $mean")
  }

  test("kNN graph ranks are dense, self-free, and duplicate-free per node") {
    import org.apache.spark.sql.Row
    val g = SparkEntry.queries("s09_knn_graph")(spark, sf)
      .select("vec_id", "rank", "nbr_id").collect()
      .map { case Row(v: Long, r: Long, n: Long) => (v, r, n) }
      .groupBy(_._1)
    assert(g.nonEmpty)
    g.foreach { case (v, edges) =>
      val ranks = edges.map(_._2).sorted.toSeq
      assert(ranks === (1L to ranks.length), s"node $v ranks not dense: $ranks")
      assert(ranks.length <= 5)
      assert(edges.forall(_._3 != v), s"node $v lists itself")
      assert(edges.map(_._3).distinct.length === edges.length, s"node $v duplicate edges")
    }
  }

  test("PQ codebook shape is constant regardless of corpus size") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    def corpus(n: Int) = spark.range(n).as[Long]
      .map(i => (i, Array.tabulate(64)(j => ((i % 7) + j).toFloat)))
      .toDF("vec_id", "embedding")
    // the compression contract: codes are PqM nibbles per vector and the
    // codebook is PqM x PqK x PqSubDim integers at ANY corpus size
    Seq(300, 3000).foreach { n =>
      val cb = SimilarityQueries.pqCodebook(spark, corpus(n))
      assert(cb.length === SimilarityQueries.PqM)
      assert(cb.forall(_.length === SimilarityQueries.PqK))
      assert(cb.forall(_.forall(_.length === SimilarityQueries.PqSubDim)))
    }
  }

  test("BM25 results are dense top-10 with non-increasing scores") {
    val rows = SparkEntry.queries("s10_bm25_retrieval")(spark, sf)
      .select("query_id", "rank", "doc_id", "score_milli").collect()
      .map { case Row(q: Long, r: Long, d: Long, s: Long) => (q, r, d, s) }
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === Set(1L, 2L, 3L))
    byQ.values.foreach { hits =>
      val sorted = hits.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to 10L))
      val scores = sorted.map(_._4).toSeq
      assert(scores === scores.sorted.reverse, s"scores not non-increasing: $scores")
      assert(scores.forall(_ > 0))
    }
  }

  test("semantic clusters are valid equivalence classes over mutual-kNN edges") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    val labels = SparkEntry.queries("s11_semantic_clusters")(spark, sf)
      .collect().map { case Row(v: Long, c: Long) => v -> c }.toMap
    // every vector labeled exactly once; representative = min member id
    assert(labels.keySet.size === 500)
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid: representative is not the min member")
    }
    // endpoints of every mutual kNN edge share a label
    val dir = SimilarityQueries.knnGraph(spark, Tables.embeddings(spark, sf))
      .select($"vec_id".as("a"), $"nbr_id".as("b"))
    val mutual = dir.join(dir.select($"b".as("a"), $"a".as("b")), Seq("a", "b"), "left_semi")
      .filter($"a" < $"b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mutual.nonEmpty, "fixture produced no mutual kNN edges")
    mutual.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"mutual edge ($a,$b) split across clusters")
    }
    // symmetrization must actually prune: strictly fewer merges than the
    // directed edge set would produce
    assert(mutual.length < dir.count(), "mutual filter pruned nothing")
  }

  test("s12 fold path equals the general anti-join path and excludes every positive") {
    import spark.implicits._
    import graft.operators.{DedupQueries, SimilarityQueries}
    val e = Tables.embeddings(spark, sf)
    val folded = SimilarityQueries.hardNegatives(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the documented equivalence, executed: the default cosine-filter fold
    // must produce bit-identical rows to anti-joining the full d06 pair set
    val general = SimilarityQueries.hardNegatives(spark, e,
        positives = Some(DedupQueries.embeddingLshPairs(spark, e)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(folded.nonEmpty, "fixture produced no hard negatives")
    assert(folded === general, "cosine-filter fold diverged from the anti-join")
    // no emitted negative may be a near-dup positive, in either orientation
    val pos = DedupQueries.embeddingLshPairs(spark, e)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    folded.foreach { case (v, _, nb, _) =>
      assert(!pos((math.min(v, nb), math.max(v, nb))),
        s"hard negative ($v,$nb) is a d06 positive pair")
    }
    // per-anchor ranks are dense from 1 and cosines non-increasing
    folded.groupBy(_._1).foreach { case (v, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length),
        s"anchor $v: ranks not dense")
      assert(sorted.map(_._4).toSeq.reverse.sorted.reverse === sorted.map(_._4).toSeq,
        s"anchor $v: cosines increase with rank")
    }
  }

  test("BM25 idf puts rare-term documents ahead of common-term ones") {
    import spark.implicits._
    // query 1 = "hash join dup": "dup" appears in ~5% of docs, the other
    // terms in ~75% — every top hit must actually contain the rare term,
    // or idf is not doing its job
    val top = SparkEntry.queries("s10_bm25_retrieval")(spark, sf)
      .filter($"query_id" === 1L && $"rank" <= 5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val dupDocs = Tables.documents(spark, sf)
      .filter(lower($"text").contains("dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(top.subsetOf(dupDocs),
      s"top-5 for the 'dup' query includes docs without 'dup': ${top -- dupDocs}")
  }

  test("s13: label profile covers the corpus, centroids broadcast, no corpus self-join") {
    val df = SparkEntry.queries("s13_label_centroids")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"centroid join must broadcast, not shuffle the corpus:\n$plan")
    val rows = df.collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "every vector profiled exactly once")
    rows.foreach { r =>
      // a vector can't be farther from its own label centroid than the
      // label minimum, and milli cosines live in [-1000, 1000]
      assert(r.getLong(3) <= r.getLong(2), s"min > avg in $r")
      assert(r.getLong(2) >= -1000L && r.getLong(2) <= 1000L)
    }
  }

  test("s18: snapshot counts partition every label and drift metrics are bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("s18_embedding_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val sizes = Tables.embeddings(spark, sf).groupBy($"label".cast("long"))
      .count().as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === sizes(r.getLong(0)),
        "parity snapshots must partition the label")
      assert(r.getLong(3) >= -1000L && r.getLong(3) <= 1000L, "centroid cosine bounds")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000L, "KS bounds")
      // no magnitude assertion: at dozens of 64-dim vectors per half,
      // the snapshot-A centroid is mostly noise (mean norm ~ 1/sqrt(n))
      // and A's cosines to its OWN centroid carry a self-bias B lacks —
      // both effects vanish at production n but dominate a spec fixture;
      // the oracle hash-match is the value gate
    }
  }

  test("s20: RRF fusion is self-consistent, rank-ordered, and keeps single-modality hits") {
    val rows = SparkEntry.queries("s20_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    def rrf(r: Long) = if (r > 0L) 1000000L / (60L + r) else 0L
    rows.foreach { case (_, _, _, fused, lr, vr) =>
      assert(fused === rrf(lr) + rrf(vr),
        s"fused_micro must equal the RRF recompute from (lex=$lr, vec=$vr)")
      assert(lr >= 0L && lr <= 20L && vr >= 0L && vr <= 20L,
        "side ranks are 0 (absent) or within the fusion window R=20")
      assert(lr > 0L || vr > 0L, "a fused row must come from at least one side")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to rs.length).toSeq,
        s"query $q ranks must be contiguous from 1")
      // fused scores non-increasing, doc_id ascending inside a tie
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 === b._4 && a._3 < b._3),
          s"query $q fused order violated between ranks ${a._2} and ${b._2}")
      case _ => ()
      }
    }
    // the full-outer contract: lexical-only and vector-only hits survive
    // (the fixture's lexical and semantic neighborhoods are uncorrelated,
    // so the two top-20s are mostly disjoint)
    assert(rows.exists(r => r._5 > 0L && r._6 === 0L), "expected a lexical-only hit")
    assert(rows.exists(r => r._6 > 0L && r._5 === 0L), "expected a vector-only hit")
  }

  test("s21: the fused spine is node-identical across the exact and indexed legs") {
    // Executes s20's scale claim — "each side swaps in its indexed variant
    // and the fusion plan is unchanged" — on the OPTIMIZED plans: walk each
    // fused frame from the root down to the full-outer join and compare the
    // node sequence (name + SQL-rendered expressions, exprIds stripped).
    // The legs below the join differ by design; everything above must not.
    import graft.operators.SimilarityQueries._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    def spine(df: org.apache.spark.sql.DataFrame): List[String] = {
      def down(n: LogicalPlan): List[String] = n match {
        case j: Join => List(s"${j.nodeName}[${j.joinType}]")
        case _ =>
          assert(n.children.size === 1,
            s"fusion spine must be linear above the join, got ${n.nodeName}")
          s"${n.nodeName}(${n.expressions.map(_.sql).mkString(", ")})" ::
            down(n.children.head)
      }
      down(df.queryExecution.optimizedPlan).map(_.replaceAll("#\\d+", ""))
    }
    val dt = postings(Tables.documents(spark, sf))
    val exact = rrfFuse(lexTopR(dt, dt), vecTopRExact(Tables.embeddings(spark, sf)))
    val indexed = rrfFuse(lexTopR(dt, impactPrunedPostings(dt)),
      vecTopRLsh(Tables.embeddings(spark, sf)))
    val (se, si) = (spine(exact), spine(indexed))
    assert(se === si,
      s"fusion subplan diverged between exact and indexed legs:\n$se\nvs\n$si")
    assert(se.exists(_.startsWith("Join[FullOuter")), "spine must end at the full-outer fuse")
    assert(se.exists(_.startsWith("Window")), "spine must carry the fused ranking window")
  }

  test("s21: indexed hybrid graded against s20's exact fusion by the s17 recall harness") {
    // The s17 computation verbatim (semi-join of the two top-k sets),
    // with s20's exact fusion as ground truth and s21 as the serving path.
    val e = SparkEntry.queries("s20_hybrid_rrf")(spark, sf)
      .select("query_id", "doc_id")
    val s = SparkEntry.queries("s21_hybrid_rrf_indexed")(spark, sf)
      .select("query_id", "doc_id")
    val hit = e.join(s, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ks = e.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ks.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(ks.values.forall(_ === 10L), "ground truth must be dense top-10")
    val recalls = ks.map { case (q, k) => hit.getOrElse(q, 0L).toDouble / k }
    val mean = recalls.sum / recalls.size
    // the indexed legs are approximate by design (LSH hamming<=3, impact
    // top-32 postings); on the weak-signal random fixture the s02 leg
    // alone documents ~0.5 recall — the fused floor matches the suite's
    // LSH convention and is far above the ~10/N random baseline
    assert(mean >= 0.2, s"mean fused recall@10 = $mean")
  }

  test("s23 kept counts sit inside t44's and s22's inclusion-exclusion bounds per lang") {
    // the apply step must agree with the two reports it composes: per
    // lang, kept >= n_train - (lex_dropped + sem_dropped) (drops may
    // overlap) and kept <= n_train - max(lex_dropped, sem_dropped)
    import graft.operators.{SimilarityQueries, TextQueries}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val lex = TextQueries.decontaminateReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sem = SimilarityQueries.semanticDecontaminateReport(spark, docs, emb)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val kept = SimilarityQueries.decontaminatedCorpus(spark, docs, emb)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lex.keySet === sem.keySet)
    assert((lex.values.map(_._2).sum + sem.values.map(_._2).sum) > 0,
      "no gate dropped anything — bounds vacuous")
    for (l <- lex.keySet) {
      val (nTrain, dLex) = lex(l)
      val dSem = sem(l)._2
      assert(sem(l)._1 === nTrain, s"gates disagree on n_train for $l")
      val k = kept.getOrElse(l, 0L)
      assert(k >= nTrain - dLex - dSem && k <= nTrain - math.max(dLex, dSem),
        s"lang $l: kept=$k outside [${nTrain - dLex - dSem}, ${nTrain - math.max(dLex, dSem)}]")
    }
  }

  test("d19 on predicted labels: the query path runs on t01 output end-to-end (mixed-vocabulary fixture)") {
    // The benchmarked d19 consumes the documents table's labeled lang
    // because the synthetic fixture's shared vocabulary would collapse
    // every langId prediction to 'en'. This fixture gives each language
    // its own stopword vocabulary, so the PREDICTED labels reproduce the
    // ground truth exactly and the d19 query path itself runs on the
    // language-ID stage's output — asserted equal to the labeled run.
    import graft.operators.SimilarityQueries
    import graft.functions.TextFns
    import spark.implicits._
    def v(hot: Int) = Array.tabulate(64)(i => if (i == hot) 1f else 0f)
    val en = "the a of and to is in"
    val de = "der die das und ist ein zu"
    val es = "el la y que los" // la is also fr; 5 es hits >= every later lang
    val fr = "le et les un est"
    val docs = Seq(
      (1L, en, "en"), (2L, de, "de"), (3L, es, "es"),
      (4L, s"$en extra words", "en"), (5L, fr, "fr"),
      (6L, s"$en one", "en"), (7L, s"$en two", "en"), (8L, s"$fr seul", "fr"))
      .toDF("doc_id", "text", "lang")
    // mirror clusters: {1 en, 2 de, 3 es}, {4 en, 5 fr}; {6,7} en-only; 8 isolated
    val emb = Seq((1L, v(0)), (2L, v(0)), (3L, v(0)), (4L, v(1)), (5L, v(1)),
      (6L, v(2)), (7L, v(2)), (8L, v(3))).toDF("vec_id", "embedding")
    val predicted = docs.select($"doc_id", TextFns.langId($"text").as("lang"))
    // the prediction is non-vacuous: it reproduces every ground-truth label
    assert(predicted.join(docs.select($"doc_id", $"lang".as("want")), Seq("doc_id"))
      .filter($"lang" =!= $"want").count() === 0L)
    val onPredicted = SimilarityQueries.crossLingualMirrors(spark, emb, predicted)
      .collect().toSeq
    val onLabeled = SimilarityQueries.crossLingualMirrors(spark, emb,
      docs.select($"doc_id", $"lang")).collect().toSeq
    assert(onPredicted === onLabeled)
    assert(onPredicted.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))) ===
      Seq(("de", "en", 1L, 2L), ("de", "es", 1L, 2L), ("en", "es", 1L, 2L),
        ("en", "fr", 1L, 2L)))
  }
}
