package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupQueries, SimilarityQueries, TextQueries}

/** Degenerate-input behavior of the library entry points: empty corpora,
  * singleton documents, empty text, corpora smaller than a codebook. A
  * production ingest sees all of these (an empty partition, a first-day
  * run, a blank document) — each must return a well-defined empty/reduced
  * result, never throw. The ADVICE m03 finding (empty-text doc dropped on
  * one side of an oracle only) is exactly this bug class. */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  private def noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc =
    Seq((1L, "a single perfectly ordinary document about spark engines")).toDF("doc_id", "text")
  private def blankAndReal = Seq(
    (1L, ""),
    (2L, "real content here with enough distinct words to clear every admission gate " +
      "because it keeps going well past twenty tokens of ordinary english text")
  ).toDF("doc_id", "text")
  private def noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private def fewVecs = (0L until 8L).map(ScaleCorpus.vec).toDF("vec_id", "embedding")

  test("ingestBatch degenerate shapes: empty corpus, all-rejected, near-dup collapse") {
    import graft.streaming.StreamIngest
    // empty and all-rejected corpora pack nothing (and must not crash)
    assert(StreamIngest.ingestBatch(noDocs).count() === 0L)
    assert(StreamIngest.ingestBatch(Seq((1L, "too short")).toDF("doc_id", "text")).count() === 0L)
    // two admissible near-dup docs collapse to ONE survivor; its token count
    // is conserved into the packed report (doc 1 wins the larger-rep drop)
    val base = (1 to 30).map("w" + _).mkString(" ")
    val packed = StreamIngest.ingestBatch(
      Seq((1L, base), (2L, base + " tail")).toDF("doc_id", "text"))
      .agg(sum($"n_docs"), sum($"n_tokens")).head()
    assert(packed.getLong(0) === 1L, "near-dup pair must leave one survivor")
    assert(packed.getLong(1) === 30L, "survivor token count must be conserved")
  }

  test("dedup pipelines return empty on an empty or singleton corpus") {
    assert(DedupQueries.minhashNearDupPairs(spark, noDocs).count() === 0L)
    assert(DedupQueries.minhashNearDupPairs(spark, oneDoc).count() === 0L)
    assert(DedupQueries.incrementalNearDupPairs(spark, noDocs, col("doc_id") < 10).count() === 0L)
    assert(DedupQueries.embeddingLshPairs(spark, noVecs).count() === 0L)
  }

  test("cluster labeling converges on empty input and labels a singleton to itself") {
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupQueries.clusterLabels(noDocs.select($"doc_id"), noPairs).count() === 0L)
    val labels = DedupQueries.clusterLabels(oneDoc.select($"doc_id"), noPairs)
      .as[(Long, Long)].collect()
    assert(labels.toSeq === Seq((1L, 1L)))
  }

  test("ANN search returns empty on an empty corpus, reduced results below k") {
    assert(SimilarityQueries.ivfSearch(spark, noVecs, noVecs).count() === 0L)
    // corpus (8) smaller than the codebook (64) and topK (10): every
    // query still gets the 7 possible neighbors, ranked 1..7
    val rows = SimilarityQueries.ivfSearch(spark, fewVecs, fewVecs.filter($"vec_id" < 2))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L))
    assert(rows.count(_._1 == 0L) === 7)
    assert(rows.filter(_._1 == 0L).map(_._2).sorted.toSeq === (1L to 7L))
    assert(SimilarityQueries.knnGraph(spark, noVecs).count() === 0L)
  }

  test("empty-text documents are rejected by the admission gate, not crashed on") {
    val kept = TextQueries.admissionFeatures(blankAndReal)
      .filter(TextQueries.admissionGate)
      .select($"doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(2L))
    assert(TextQueries.boilerplateSpans(noDocs.withColumn("lang", lit("en"))).count() === 0L)
    // the per-lang summary row must count the blank doc without crashing
    // and report zero cross-document shingles
    val span = TextQueries.boilerplateSpans(blankAndReal.withColumn("lang", lit("en")))
      .select($"lang", $"n_docs", $"shared_shingles").as[(String, Long, Long)].collect()
    assert(span.toSeq === Seq(("en", 2L, 0L)))
  }

  test("pageRank handles empty graphs: no nodes => no rows, no edges => teleport only") {
    import graft.operators.EventQueries
    val noNodes = Seq.empty[Long].toDF("k")
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(EventQueries.pageRank(noNodes, noEdges, iters = 10).count() === 0L)
    // nodes with no edges at all: every rank is exactly the teleport term
    val lonely = Seq(1L, 2L, 3L).toDF("k")
    val r = EventQueries.pageRank(lonely, noEdges, iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 150000L, 2L -> 150000L, 3L -> 150000L))
  }

  test("chunkDocs covers every character, honors boundaries, keeps empty docs") {
    // boundary lengths around size=10/stride=7: len<=size -> 1 chunk,
    // len=size+1 -> 2 chunks, and the windows tile with exact 3-char overlap
    val docs = Seq(
      (1L, ""), (2L, "short"), (3L, "a" * 10), (4L, "abcdefghijk"), // len 11
      (5L, ("abcdefghij" * 5).take(32))
    ).toDF("doc_id", "text")
    val rows = TextQueries.chunkDocs(docs, size = 10, stride = 7)
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"chunk_start", $"chunk_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).map(r => (r._3, r._4)) === Seq((1L, 0L))) // one empty chunk
    assert(byDoc(2L).map(r => (r._3, r._4)) === Seq((1L, 5L)))
    assert(byDoc(3L).map(r => (r._3, r._4)) === Seq((1L, 10L)))
    assert(byDoc(4L).map(r => (r._3, r._4)) === Seq((1L, 10L), (8L, 4L)))
    // full coverage: chunk spans [start, start+len) union to [1, docLen]
    byDoc(5L).sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3 + a._4, s"gap between chunks: $a -> $b")
    }
    assert(byDoc(5L).map(r => r._3 + r._4 - 1).max === 32L)
    // md5 is over the chunk bytes: two identical windows fingerprint equal
    val same = TextQueries.chunkDocs(
      Seq((9L, "xyzxyzx")).toDF("doc_id", "text"), size = 3, stride = 3)
      .select($"chunk_md5").as[String].collect()
    assert(same(0) === same(1)) // "xyz" == "xyz"
  }

  test("bottomKSample: empty input, k past the stratum size, partition-stable") {
    val docs = Seq(
      (1L, "aa", "en"), (2L, "bb", "en"), (3L, "cc", "en"),
      (4L, "dd", "de")
    ).toDF("doc_id", "text", "lang")
    assert(TextQueries.bottomKSample(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"), 5).count() === 0L)
    // k exceeds every stratum: all rows sampled, ranks dense per stratum
    val all = TextQueries.bottomKSample(docs, 10)
      .select($"lang", $"sample_rank", $"doc_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(all.length === 4)
    assert(all.filter(_._1 == "en").map(_._2).sorted === Seq(1L, 2L, 3L))
    assert(all.filter(_._1 == "de").map(_._2) === Seq(1L))
    // membership is a pure function of the ids: shuffling the input's
    // physical layout must not change the sample
    val a = TextQueries.bottomKSample(docs, 2).collect().toSeq
    val b = TextQueries.bottomKSample(docs.repartition(7), 2).collect().toSeq
    assert(a === b)
  }

  test("q80: FIFO overlap matching telescopes to min(supply, demand) per part") {
    val rows = SparkEntry.queries("q80_fifo_allocation")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sup, dem, m, unmet) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m === math.min(sup, dem), s"conservation broken: $r")
      assert(unmet === dem - m, s"unmet mismatch: $r")
    }
  }

  test("mergeUpsert: all three MERGE actions classify correctly, key set is the union") {
    import graft.operators.ExtraRelationalQueries.mergeUpsert
    val target = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "tval")
    val source = Seq((2L, -50L), (9L, 700L)).toDF("k", "delta")
    val got = mergeUpsert(target, source)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> ("unchanged", 100L), 2L -> ("updated", 150L),
      3L -> ("unchanged", 300L), 9L -> ("inserted", 700L)))
  }

  test("checksumReport: planted divergence flags exactly its bucket; order-invariant") {
    import graft.operators.ExtraRelationalQueries.checksumReport
    val rows = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 20L), (4L, "d", 20L))
    def report(data: Seq[(Long, String, Long)], parts: Int) =
      checksumReport(data.toDF("id", "v", "bucket").repartition(parts),
        $"bucket", $"id", $"v")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val base = report(rows, 1)
    // signatures are pure functions of the multiset: layout can't move them
    assert(report(scala.util.Random.shuffle(rows), 7) === base)
    // mutate one row's value: only its bucket's signature may change
    val mutated = report(rows.updated(2, (3L, "X", 20L)), 2)
    assert(mutated(10L) === base(10L))
    assert(mutated(20L) !== base(20L))
    assert(mutated(20L)._1 === base(20L)._1, "count stays — value edit, not cardinality")
    // drop a row: count catches it
    val dropped = report(rows.take(3), 2)
    assert(dropped(20L)._1 === 1L && base(20L)._1 === 2L)
  }

  test("weightedSample: PPS bias toward heavy docs, partition-stable, weight clamp") {
    // 30 light docs (w=10) vs 30 heavy (w=1000): the k=10 PPS sample must
    // be dominated by heavy docs (priority = u/w, heavy => ~100x smaller)
    val docs = ((1L to 30L).map(i => (i, "x", "en", 10L)) ++
      (31L to 60L).map(i => (i, "x", "en", 1000L)))
      .toDF("doc_id", "text", "lang", "n_chars")
    val picked = TextQueries.weightedSample(docs, 10)
      .select($"doc_id").as[Long].collect().toSet
    val heavy = picked.count(_ > 30L)
    assert(heavy >= 8, s"PPS sample should favor 100x-heavier docs, got $heavy/10 heavy")
    // pure function of (doc_id, weight): physical layout can't change it
    val a = TextQueries.weightedSample(docs, 5).collect().toSeq
    val b = TextQueries.weightedSample(docs.repartition(7), 5).collect().toSeq
    assert(a === b)
    // zero-weight docs are clamped, not divided by zero
    val z = Seq((1L, "x", "en", 0L)).toDF("doc_id", "text", "lang", "n_chars")
    assert(TextQueries.weightedSample(z, 3).select($"weight").as[Long].head() === 1L)
  }

  test("proximitySearch: window boundary is inclusive, order-agnostic, unknown terms empty") {
    import graft.operators.SimilarityQueries.proximitySearch
    // "b" at pos 2; "z" at pos 5 (distance 3) and pos 9 (distance 7)
    val docs = Seq((1L, "en", "a b c d z f g h z")).toDF("doc_id", "lang", "text")
    def run(w: Int, qs: Seq[(Long, String, String)]) =
      proximitySearch(docs, qs, w).select($"n_docs", $"n_pairs")
        .as[(Long, Long)].collect().toSeq
    assert(run(3, Seq((1L, "b", "z"))) === Seq((1L, 1L)), "distance-3 pair inside w=3")
    assert(run(2, Seq((1L, "b", "z"))) === Seq.empty, "w=2 excludes distance 3")
    assert(run(7, Seq((1L, "b", "z"))) === Seq((1L, 2L)), "w=7 admits both z positions")
    assert(run(7, Seq((1L, "z", "b"))) === Seq((1L, 2L)), "term order irrelevant")
    assert(run(9, Seq((1L, "b", "nope"))) === Seq.empty, "unknown term matches nothing")
  }

  test("bm25Search: empty corpus, unknown terms, k past the match count") {
    val qs = Seq(1L -> Seq("spark", "engines"), 2L -> Seq("zzz_not_a_word"))
    assert(SimilarityQueries.bm25Search(noDocs, qs, 10).count() === 0L)
    val hits = SimilarityQueries.bm25Search(oneDoc, qs, 10)
      .select($"query_id", $"rank", $"doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // query 1 matches the one doc (k truncates to the match count); the
    // unknown-term query returns no rows at all rather than zero scores
    assert(hits === Seq((1L, 1L, 1L)))
  }

  test("semanticClusters: empty corpus => no labels; tiny corpus all labeled") {
    assert(SimilarityQueries.semanticClusters(spark, noVecs).count() === 0L)
    val labels = SimilarityQueries.semanticClusters(spark, fewVecs)
      .as[(Long, Long)].collect().toSeq
    assert(labels.map(_._1).sorted === (0L until 8L))
    // representative is always the min member of its cluster
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
    }
  }

  test("zOrderWrite handles empty and single-row inputs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_edge_z").toString
    val empty = Seq.empty[(Long, Long, Double)].toDF("a", "b", "x")
    graft.operators.LayoutQueries.zOrderWrite(empty, "a", "b", 4, s"$tmp/empty")
    assert(spark.read.parquet(s"$tmp/empty").count() === 0L)
    val one = Seq((5L, 7L, 1.0)).toDF("a", "b", "x")
    graft.operators.LayoutQueries.zOrderWrite(one, "a", "b", 4, s"$tmp/one")
    assert(spark.read.parquet(s"$tmp/one").as[(Long, Long, Double)].collect()
      .toSeq === Seq((5L, 7L, 1.0)))
  }

  test("triangleCounts on empty and triangle-free graphs") {
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(graft.operators.EventQueries.triangleCounts(none).count() === 0L)
    // a path graph has edges but no triangles: nodes still reported, all 0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = graft.operators.EventQueries.triangleCounts(path)
    assert(got.count() === 4L)
    assert(got.filter($"n_tri" =!= 0L).count() === 0L)
  }

  test("repeatedSpans degenerate shapes: empty corpus, empty docs, sub-shingle docs") {
    import graft.operators.TextQueries
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(TextQueries.repeatedSpans(empty).count() === 0L)
    // empty and sub-8-token docs produce one partial shingle each; identical
    // partial shingles are a <15-token span, so nothing is reported
    val tiny = Seq((1L, "", "en"), (2L, "", "en"),
      (3L, "a b c", "en"), (4L, "a b c", "en")).toDF("doc_id", "text", "lang")
    assert(TextQueries.repeatedSpans(tiny).count() === 0L)
  }

  test("spanScrubReport: empty/span-free corpora report nothing; adjacent cuts coalesce") {
    import graft.operators.TextQueries
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(TextQueries.spanScrubReport(empty).count() === 0L)
    val noSpans = Seq((1L, (1 to 30).map("a" + _).mkString(" "), "en"),
      (2L, (1 to 30).map("b" + _).mkString(" "), "en")).toDF("doc_id", "text", "lang")
    assert(TextQueries.spanScrubReport(noSpans).count() === 0L)
    // doc 9 loses [1,16] to doc 1 and [17,32] to doc 2 — the cuts touch
    // (17 = 16 + 1) without overlapping, so they coalesce into ONE
    // 32-token segment; the boundary-straddling shingles of doc 9 exist
    // nowhere else, so the miner reports the two spans separately
    val p = (1 to 16).map(i => s"p$i").mkString(" ")
    val q = (1 to 16).map(i => s"q$i").mkString(" ")
    val adj = Seq(
      (1L, s"$p x1 x2 x3 x4", "en"),
      (2L, s"y1 y2 y3 y4 $q", "en"),
      (9L, s"$p $q z1 z2", "en")).toDF("doc_id", "text", "lang")
    val r = TextQueries.spanScrubReport(adj)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq(("en", 1L, 1L, 32L, 34L, 941L)))
  }

  test("shipmentConcurrency: zero-length intervals never count open; singleton peak is 1") {
    import graft.operators.ExtraRelationalQueries
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // supplier 1: one zero-length interval [t, t) — the -1 sorts before the
    // +1 at the shared instant, so it is never observed open: peak 0.
    // supplier 2: one real interval: peak 1.
    val li = Seq((1L, ts(5), ts(5)), (2L, ts(5), ts(6)))
      .toDF("l_suppkey", "l_shipdate", "l_receiptdate")
    val r = ExtraRelationalQueries.shipmentConcurrency(li)
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((0L, 1L), (1L, 1L)))
    val empty = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("l_suppkey", "l_shipdate", "l_receiptdate")
    assert(ExtraRelationalQueries.shipmentConcurrency(empty).count() === 0L)
  }

  test("epochWaterfill: empty source table is empty; a lone source takes the whole budget") {
    import graft.operators.TextQueries
    val empty = Seq.empty[(String, Long, Long)].toDF("source", "s_tokens", "cap_milli")
    assert(TextQueries.epochWaterfill(empty).count() === 0L)
    // one source under its cap: lambda = the full budget level
    val lone = Seq(("a", 100L, 2000L)).toDF("source", "s_tokens", "cap_milli")
    assert(TextQueries.epochWaterfill(lone)
      .select($"epochs_milli", $"alloc_tokens").as[(Long, Long)].head === ((1500L, 150L)))
  }

  test("domainGovernance: empty is empty; budget 100% never caps; one domain soaks its budget") {
    import graft.operators.TextQueries
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "url")
    assert(TextQueries.domainGovernance(empty).count() === 0L)
    val urls = Seq((1L, "https://a.com/x"), (2L, "https://a.com/y"),
      (3L, "https://b.com/z")).toDF("doc_id", "url")
    // 100% budget: the waterfill degrades to every domain at its own count
    val full = TextQueries.domainGovernance(urls, budgetPct = 100L)
      .as[(String, Long, Long, Long)].collect()
    assert(full.forall(r => r._4 === r._3), s"100% budget must not cap: ${full.toSeq}")
    // a lone domain takes the whole (rounded-down) budget
    val lone = TextQueries.domainGovernance(
      Seq((1L, "https://a.com/x"), (2L, "https://a.com/y")).toDF("doc_id", "url"),
      budgetPct = 50L).as[(String, Long, Long, Long)].head
    assert(lone === (("a.com", 2L, 2L, 1L)))
  }

  test("licenseFold: single-tier corpus never escalates; empty is empty") {
    import graft.operators.TextQueries
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextQueries.licenseFold(empty).count() === 0L)
    val docs = Seq((1L, "x y", "s"), (2L, "x  Y", "s"), (3L, "z", "s"))
      .toDF("doc_id", "text", "source")
    val r = TextQueries.licenseFold(docs, lit(1L))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq(("attribution", 2L, 0L, 3L, 3L)),
      "uniform tier: two groups, zero escalations, keeper tokens 2 + 1")
  }

  test("decontaminateReport: no heldout side means nothing drops; all-heldout means no train") {
    import graft.operators.TextQueries
    val docs = Seq((1L, (1 to 9).map("a" + _).mkString(" "), "en"),
      (2L, (1 to 9).map("a" + _).mkString(" "), "en")).toDF("doc_id", "text", "lang")
    // everything train: identical docs share every shingle, but train-train
    // overlap never drops anything
    val allTrain = TextQueries.decontaminateReport(docs, trainPred = lit(true))
      .as[(String, Long, Long, Long, Long)].head
    assert(allTrain === (("en", 2L, 0L, 0L, 18L)))
    // everything heldout: the train side is empty, so the report is too
    assert(TextQueries.decontaminateReport(docs, trainPred = lit(false)).count() === 0L)
  }

  test("modelScores scores the empty doc (one empty token) instead of crashing") {
    import graft.operators.TextQueries
    val r = TextQueries.modelScores(
      Seq((1L, "", "en")).toDF("doc_id", "text", "lang")).collect()
    assert(r.length === 1 && r.head.getLong(2) === 1L) // "" -> one empty token
  }

  test("m06 shard packing: an asset larger than the budget still lands in one shard") {
    import spark.implicits._
    // oversized assets must not be split or dropped — they get a shard of
    // their own (the greedy rule assigns by the cumsum BEFORE the asset)
    val big = "x" * (graft.operators.Multimodal.ShardBytes.toInt + 1000)
    val ds = Seq(
      graft.operators.Multimodal.MediaAsset(1L, big.getBytes, "image/png", big.length.toLong),
      graft.operators.Multimodal.MediaAsset(2L, "small".getBytes, "image/png", 5L)).toDS()
    // reuse the packing logic through the registry shape: pack via a local
    // frame mirroring m06's kernel
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_type").orderBy($"asset_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = ds.toDF()
      .withColumn("cum", sum($"n_bytes").over(w))
      .withColumn("shard_id",
        floor(($"cum" - $"n_bytes") / graft.operators.Multimodal.ShardBytes).cast("long"))
    val byAsset = packed.select($"asset_id", $"shard_id").as[(Long, Long)].collect().toMap
    assert(byAsset(1L) === 0L)
    assert(byAsset(2L) === 1L, "the asset after an oversized one starts the next shard")
  }

  test("q63 orphanReport counts planted FK violations and zero on clean data") {
    import graft.operators.ExtraRelationalQueries.orphanReport
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val clean = Seq(1L, 1L, 3L).toDF("fk")
    assert(orphanReport("c->p", clean, "fk", parent, "pk")
      .collect()(0).getLong(1) === 0L)
    val dirty = Seq(1L, 4L, 4L, 9L).toDF("fk") // 3 orphan rows (two keys)
    assert(orphanReport("c->p", dirty, "fk", parent, "pk")
      .collect()(0).getLong(1) === 3L)
  }

  test("MisraGries degenerate shapes: k=1, empty input, single key") {
    val mg1 = new graft.functions.MisraGries(1)
    assert(spark.createDataset(Seq.empty[Long]).select(mg1.toColumn).head() === Map.empty)
    val single = spark.createDataset(Seq.fill(100)(42L)).repartition(3)
    assert(single.select(mg1.toColumn).head() === Map(42L -> 100L))
  }

  test("decontaminateReport degenerate shapes: no heldout, no train, empty corpus") {
    def docs(rows: (Long, String, String)*) = rows.toDF("doc_id", "text", "lang")
    val txt = (1 to 25).map("w" + _).mkString(" ")
    // every doc train: nothing can leak, zero drops, every token clean
    val allTrain = TextQueries.decontaminateReport(
      docs((1L, txt, "en"), (2L, txt + " extra", "en")), trainPred = lit(true))
    assert(allTrain.as[(String, Long, Long, Long, Long)].collect().toSeq ===
      Seq(("en", 2L, 0L, 0L, 51L)))
    // every doc heldout: no train side at all -> empty report, not a crash
    assert(TextQueries.decontaminateReport(
      docs((1L, txt, "en")), trainPred = lit(false)).count() === 0L)
    assert(TextQueries.decontaminateReport(
      docs(), trainPred = lit(true)).count() === 0L)
    // sub-shingle train docs (< 8 tokens) carry no keys and are never dropped
    val short = TextQueries.decontaminateReport(
      docs((1L, txt, "en"), (2L, "tiny doc", "en")),
      trainPred = $"doc_id" === 2L)
    assert(short.as[(String, Long, Long, Long, Long)].collect().toSeq ===
      Seq(("en", 1L, 0L, 0L, 2L)))
  }

  test("crossLingualMirrors: empty inputs and monolingual corpora report nothing") {
    val noLangs = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(SimilarityQueries.crossLingualMirrors(spark, noVecs, noLangs).count() === 0L)
    // a corpus whose clusters are all one language has no mirror pairs
    val langs = (0L until 8L).map(i => (i, "en")).toDF("doc_id", "lang")
    assert(SimilarityQueries.crossLingualMirrors(spark, fewVecs, langs).count() === 0L)
  }

  test("rrfFuse: one-sided and empty lists survive the full-outer fuse") {
    val noRanks = Seq.empty[(Long, Long, Long)]
    val lex = Seq((1L, 7L, 1L)).toDF("query_id", "doc_id", "lex_rank")
    val noVec = noRanks.toDF("query_id", "doc_id", "vec_rank")
    // vector side empty: the lexical hit still scores with vec_rank 0
    val oneSided = SimilarityQueries.rrfFuse(lex, noVec)
      .select($"doc_id", $"lex_rank", $"vec_rank", $"fused_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(oneSided === Seq((7L, 1L, 0L, 1000000L / 61L)))
    // both sides empty: empty result, not a crash
    assert(SimilarityQueries.rrfFuse(
      noRanks.toDF("query_id", "doc_id", "lex_rank"), noVec).count() === 0L)
  }

  test("impactPrunedPostings: lists at or under the cap pass through whole") {
    val dt = Seq((1L, "a", 3L), (2L, "a", 2L), (1L, "b", 1L)).toDF("doc_id", "tok", "tf")
    assert(SimilarityQueries.impactPrunedPostings(dt).collect().toSet ===
      dt.collect().toSet)
    assert(SimilarityQueries.impactPrunedPostings(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "tok", "tf")).count() === 0L)
  }

  test("s22 semanticDecontaminateReport: empty corpora, all-heldout, and vector-less train degrade gracefully") {
    import org.apache.spark.sql.functions.lit
    val noLangDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(SimilarityQueries.semanticDecontaminateReport(spark, noLangDocs, noVecs)
      .count() === 0L)
    val docs = Seq((1L, "a b", "en"), (2L, "c d", "en")).toDF("doc_id", "text", "lang")
    val e1 = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val emb = Seq((1L, e1), (2L, e1.clone())).toDF("vec_id", "embedding")
    // everything heldout: no train rows, empty report
    assert(SimilarityQueries.semanticDecontaminateReport(spark, docs, emb,
      trainPred = lit(false)).count() === 0L)
    // everything train: nothing to probe against, zero drops, tokens clean
    val allTrain = SimilarityQueries.semanticDecontaminateReport(spark, docs, emb,
      trainPred = lit(true)).as[(String, Long, Long, Long, Long)].head()
    assert(allTrain === (("en", 2L, 0L, 0L, 4L)))
    // train docs without embeddings are counted, never droppable
    val noVecTrain = SimilarityQueries.semanticDecontaminateReport(spark, docs, noVecs,
      trainPred = col("doc_id") === 1L).as[(String, Long, Long, Long, Long)].head()
    assert(noVecTrain === (("en", 1L, 0L, 0L, 2L)))
  }

  test("s23 decontaminatedCorpus: empty corpora and all-heldout splits degrade gracefully") {
    import org.apache.spark.sql.functions.lit
    val noLangDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(SimilarityQueries.decontaminatedCorpus(spark, noLangDocs, noVecs).count() === 0L)
    val docs = Seq((1L, "a b", "en"), (2L, "c d", "en")).toDF("doc_id", "text", "lang")
    val e1 = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val emb = Seq((1L, e1), (2L, e1.clone())).toDF("vec_id", "embedding")
    // everything heldout: nothing to keep
    assert(SimilarityQueries.decontaminatedCorpus(spark, docs, emb,
      trainPred = lit(false)).count() === 0L)
    // everything train: nothing probes, everything kept
    assert(SimilarityQueries.decontaminatedCorpus(spark, docs, emb,
      trainPred = lit(true)).as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "en", 2L), (2L, "en", 2L)))
  }

  test("StreamClusterLabels state: empty batches and self-pairs are no-ops, labelsFor defaults to self") {
    import graft.streaming.StreamClusterLabels
    val st = new StreamClusterLabels.ClusterState(spark, None)
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    st.merge(noPairs, 0L)
    assert(st.snapshot.count() === 0L)
    // a self-pair links nothing: root edge filtered, entity still tracked
    st.merge(Seq((5L, 5L)).toDF("doc_a", "doc_b"), 1L)
    assert(st.labelsFor(Seq(5L, 6L).toDF("doc_id")).as[(Long, Long)]
      .collect().toSeq === Seq((5L, 5L), (6L, 6L)))
  }
}
