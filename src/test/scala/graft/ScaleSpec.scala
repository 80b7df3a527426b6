package graft

import org.apache.spark.sql.DataFrame
import graft.operators.DedupQueries

/** Measured scale-trend evidence for the two LSH dedup scale paths: run
  * the d03 (MinHash over text) and d06 (sign-LSH over embeddings)
  * pipelines on synthetic corpora at two sizes 10x apart and assert the
  * runtime grows sub-quadratically and the emitted pair count stays
  * near-linear. A quadratic regression (e.g. an unblocked self-join
  * sneaking back in) blows both bounds by orders of magnitude; plan
  * audits say the shape is right, this says the CLOCK agrees. Bounds are
  * deliberately generous — a shared local[4] JVM is noisy — but a 10x
  * corpus at 100x the time or pairs still fails loudly.
  *
  * The corpora embed near-dups at a FIXED per-doc rate (every 10th doc,
  * fixed-size embedding clusters), so true pair counts scale exactly
  * linearly by construction; everything is deterministic in the doc id
  * (no RNG — retry-stable, like the load soak in
  * /root/reference/tests/load.rs:7-42 this spec generalizes). */
/** Deterministic corpus kernels in a standalone object so Spark closures
  * don't drag the (non-serializable) suite instance along. */
private object ScaleCorpus extends Serializable {

  /** splitmix64 finalizer — cheap deterministic per-id pseudo-randomness. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def doc(i: Long): (Long, String) = {
    val base = if (i % 10 == 9) i - 1 else i
    val words = Array.tabulate(40)(w => s"w${mix(base * 41 + w) % 100000}")
    if (i % 10 == 9) words(39) = "changed"
    (i, words.mkString(" "))
  }

  def vec(i: Long): (Long, Array[Float]) = {
    val cluster = i / 4
    val emb = Array.tabulate(64) { j =>
      val base = mix(cluster * 131 + j).toDouble / Long.MaxValue
      val noise = (mix(i * 257 + j).toDouble / Long.MaxValue) * 0.25
      (base + noise).toFloat
    }
    (i, emb)
  }

  /** The 100x tier's variant: same 4-id clusters, noise shrunk to 0.01 so
    * within-cluster cosine is ~0.9999 and sign-LSH recall at the tier's
    * deep K stays lossless — the tier asserts EXACT output linearity, so
    * the generator must make true matches certain, not merely likely. */
  def vecTight(i: Long): (Long, Array[Float]) = {
    val cluster = i / 4
    val emb = Array.tabulate(64) { j =>
      val base = mix(cluster * 131 + j).toDouble / Long.MaxValue
      val noise = (mix(i * 257 + j).toDouble / Long.MaxValue) * 0.01
      (base + noise).toFloat
    }
    (i, emb)
  }
}

class ScaleSpec extends SparkSpec {

  import spark.implicits._

  /** n docs of 40 words; every 10th doc repeats the previous doc's
    * template with ONE word changed (37 of 41 shingles shared => jaccard
    * 0.90, above d03's 0.8 near-dup bar); all other docs are unrelated. */
  private def docCorpus(n: Int): DataFrame =
    spark.range(n).as[Long].map(ScaleCorpus.doc _).toDF("doc_id", "text")

  /** n unit-scale 64-dim vectors in clusters of 4 consecutive ids: shared
    * cluster direction plus small per-id noise => within-cluster cosine
    * well above d06's 0.4 bar, cross-cluster cosine ~0 (random directions
    * in 64 dims), so true pairs = 6 per cluster = 1.5 per vector. */
  private def vecCorpus(n: Int): DataFrame =
    spark.range(n).as[Long].map(ScaleCorpus.vec _).toDF("vec_id", "embedding")

  private def timed(f: => Long): (Double, Long) = {
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** Sub-quadratic runtime + near-linear output across a 10x growth. The
    * runtime bound uses a floor so the small run's fixed job-scheduling
    * cost (~0.5 s for these multi-stage pipelines) can't make the ratio
    * vacuously strict or trivially loose. */
  private def assertTrend(name: String, run: DataFrame => Long,
      small: DataFrame, big: DataFrame): Unit = {
    run(small) // warmup: codegen + JIT, untimed
    spark.catalog.clearCache()
    val (tS, pairsS) = timed(run(small))
    val (tL, pairsL) = timed(run(big))
    info(f"$name: 1x -> ${tS}%.2f s / $pairsS pairs, 10x -> ${tL}%.2f s / $pairsL pairs")
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"$name runtime grew super-linearly: ${tS}%.2f s -> ${tL}%.2f s for 10x data")
    assert(pairsL <= 15L * math.max(pairsS, 1L),
      s"$name pair count grew super-linearly: $pairsS -> $pairsL for 10x data")
    assert(pairsL >= 4L * pairsS,
      s"$name lost recall at scale: $pairsS -> $pairsL for 10x data")
  }

  test("d03 minhash dedup: 10x corpus => ~10x runtime and pairs") {
    assertTrend("d03",
      df => DedupQueries.minhashNearDupPairs(spark, df).count(),
      docCorpus(4000), docCorpus(40000))
  }

  test("t44 decontamination: 10x corpus => ~10x runtime and dropped docs") {
    // ScaleCorpus pairs share shingles only with each other, so a train
    // doc drops iff its partner lands heldout under the 90/10 hash split —
    // dropped docs are linear in corpus size (~2 * 0.1 * pairs), and the
    // heldout-shingle semi-join must stay linear in corpus shingles
    import graft.operators.TextQueries
    import org.apache.spark.sql.functions.{lit, sum}
    assertTrend("t44",
      df => TextQueries.decontaminateReport(df.withColumn("lang", lit("en")))
        .agg(sum($"n_dropped")).as[Long].head,
      docCorpus(4000), docCorpus(40000))
  }

  test("t34 content-defined chunking: 10x corpus => ~10x runtime and chunks") {
    import graft.operators.TextQueries
    assertTrend("t34",
      df => TextQueries.cdcChunks(df).count(),
      docCorpus(4000), docCorpus(40000))
  }

  test("d13 prefix-filter exact join: 10x corpus => ~10x runtime and pairs") {
    // the EXACT path must show the same trend as the sketch path: prefix
    // buckets (rare-first) keep candidate generation linear in true
    // near-dups; a degenerate prefix (e.g. ordering regression putting
    // common shingles in prefixes) floods candidates and trips the clock
    assertTrend("d13",
      df => DedupQueries.prefixFilterNearDupPairs(spark, df).count(),
      docCorpus(4000), docCorpus(40000))
  }

  test("t14 boilerplate spans: 10x corpus => ~10x runtime and shared shingles") {
    // every 10th doc shares 37 of its 8-gram shingles with its template
    // doc, so true shared-shingle counts scale linearly by construction
    import org.apache.spark.sql.functions.lit
    assertTrend("t14",
      df => graft.operators.TextQueries
        .boilerplateSpans(df.withColumn("lang", lit("en")))
        .agg(org.apache.spark.sql.functions.sum($"shared_shingles"))
        .as[Long].collect()(0),
      docCorpus(4000), docCorpus(40000))
  }

  test("t20 repeated spans: 10x corpus => ~10x runtime and span pairs") {
    // every 10th doc repeats its template's first 39 tokens verbatim, so
    // each dup pair carries exactly one 39-token maximal span (32
    // consecutive shingle matches on one diagonal) — span rows = n/10,
    // linear by construction; a degenerate diagonal join (or a df-cap
    // failure) floods the pair count long before the clock trips
    assertTrend("t20",
      df => graft.operators.TextQueries.repeatedSpans(df).count(),
      docCorpus(4000), docCorpus(40000))
  }

  test("t39 span scrub: 10x corpus => ~10x runtime and removed tokens") {
    // every 10th doc is the higher-id side of exactly one 39-token span
    // (it repeats its template's first 39 tokens), so scrubbed tokens =
    // 39 * n/10 — linear by construction; the interval merge adds only
    // O(spans) work on top of the t20 miner
    import org.apache.spark.sql.functions.lit
    assertTrend("t39",
      df => graft.operators.TextQueries
        .spanScrubReport(df.withColumn("lang", lit("en")))
        .agg(org.apache.spark.sql.functions.sum($"tokens_removed"))
        .as[Long].collect()(0),
      docCorpus(4000), docCorpus(40000))
  }

  test("q104 sweep: 10x suppliers => ~10x runtime, exactly 10x histogram mass") {
    // every supplier carries the IDENTICAL 100-interval pattern (ship day
    // and duration depend only on the within-supplier index), so the peak
    // histogram is one row whose count = supplier count — exactly 10x at
    // 10x rows; the sweep's only state is per-supplier, so runtime must
    // track the row count, not the supplier cross-product
    import org.apache.spark.sql.functions.{col, lit, pmod, timestamp_seconds}
    def intervals(n: Int) = {
      val w = pmod(col("id"), lit(100L))
      val ship = pmod(w * 37L + 11L, lit(365L)) * 86400L
      val dur = (pmod(w * 17L + 5L, lit(14L)) + 1L) * 86400L
      spark.range(n).select(
        (col("id") / 100L).cast("long").as("l_suppkey"),
        timestamp_seconds(ship).as("l_shipdate"),
        timestamp_seconds(ship + dur).as("l_receiptdate"))
    }
    def run(n: Int): (Double, Long) = timed {
      graft.operators.ExtraRelationalQueries.shipmentConcurrency(intervals(n))
        .agg(org.apache.spark.sql.functions.sum($"n_suppliers"))
        .as[Long].collect()(0)
    }
    run(40000) // warmup: codegen + JIT, untimed
    val (tS, supS) = run(40000)
    val (tL, supL) = run(400000)
    info(f"q104: 1x -> $tS%.2f s / $supS suppliers, 10x -> $tL%.2f s / $supL suppliers")
    assert(supS == 400L && supL == 4000L,
      s"histogram mass must equal the supplier count exactly: got $supS / $supL")
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"q104 runtime grew super-linearly: $tS%.2f s -> $tL%.2f s for 10x data")
  }

  test("s19 index build: 10x corpus => ~10x runtime, exact token conservation") {
    // all docs pass admission (40 diverse tokens each), so the packed
    // chunk token totals must conserve the corpus EXACTLY: 40n tokens at
    // both scales — any loss (a dropped doc, a packing off-by-one) or
    // inflation (a doc packed twice) breaks equality, and super-linear
    // runtime means the codebook broadcast or the cell join degenerated
    def run(n: Int): (Double, Long) = timed {
      graft.operators.SimilarityQueries
        .indexBuild(spark, docCorpus(n), vecCorpus(n))
        .agg(org.apache.spark.sql.functions.sum($"n_tokens"))
        .as[Long].collect()(0)
    }
    run(2000) // warmup: codegen + JIT, untimed
    val (tS, tokS) = run(2000)
    val (tL, tokL) = run(20000)
    info(f"s19: 1x -> $tS%.2f s / $tokS tokens, 10x -> $tL%.2f s / $tokL tokens")
    assert(tokS == 40L * 2000 && tokL == 40L * 20000,
      s"packing must conserve admitted tokens exactly: got $tokS / $tokL")
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"s19 runtime grew super-linearly: $tS%.2f s -> $tL%.2f s for 10x data")
  }

  test("d06 embedding-LSH dedup: 10x corpus => ~10x runtime and pairs") {
    // K and the cosine bar are tuned for THIS corpus per the pipeline's
    // documented contract (K ~ 2*log2(n) - 10, threshold above the random
    // cross-pair cosine tail): the fixture defaults (K=6, 0.4) are for the
    // 500-vector test table and at 20k vectors would admit the n^2/2^K
    // random-collision candidate flood this spec exists to catch.
    assertTrend("d06",
      df => DedupQueries.embeddingLshPairs(spark, df,
        tables = 12, planesPerTable = 14, minCosMilli = 850L).count(),
      vecCorpus(2000), vecCorpus(20000))
  }

  test("d08 cluster labels: 10x graph => ~10x runtime, linear cluster count") {
    // chains of 8 consecutive ids (n divisible by 8): 10x nodes => 10x
    // edges at CONSTANT diameter, so pointer-jumping round count stays
    // fixed and per-round work must scale linearly; the metric is the
    // number of distinct components (= n/8 by construction), which a
    // mislabeling bug (or a flooded join) breaks before the clock does
    def graph(n: Int): DataFrame = spark.range(n).toDF("doc_id")
    def run(docs: DataFrame): Long = {
      val ids = docs.select($"doc_id")
      val edges = ids.filter($"doc_id" % 8 =!= 7)
        .select($"doc_id".as("doc_a"), ($"doc_id" + 1).as("doc_b"))
      DedupQueries.clusterLabels(docs, edges, localFoldMaxEdges = -1L)
        .select($"cluster_id").distinct().count() // distributed rounds are the subject
    }
    assertTrend("d08", run, graph(40000), graph(400000))
  }

  test("d11 incremental dedup: 10x history, fixed new slice => constant pairs") {
    // the daily-ingest contract: mining pairs that TOUCH a fixed new slice
    // against a 10x larger history costs at most the linear band-table
    // build, and the pair set is exactly the same 100 template pairs (the
    // corpus embeds near-dups only within id-decades, so no pair crosses
    // the slice boundary and history growth adds zero touching pairs)
    def run(df: DataFrame): Long =
      DedupQueries.incrementalNearDupPairs(spark, df,
        org.apache.spark.sql.functions.col("doc_id") < 1000).count()
    val (small, big) = (docCorpus(4000), docCorpus(40000))
    run(small) // warmup
    spark.catalog.clearCache()
    val (tS, nS) = timed(run(small))
    val (tL, nL) = timed(run(big))
    info(f"d11: 1x -> ${tS}%.2f s / $nS pairs, 10x -> ${tL}%.2f s / $nL pairs")
    assert(nS === 100L && nL === 100L,
      s"fixed-slice pair set must not change with history size: $nS / $nL")
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"d11 runtime grew super-linearly: ${tS}%.2f s -> ${tL}%.2f s for 10x history")
  }

  test("s03 IVF search: 10x corpus => ~10x runtime, constant codebook and output") {
    // the round-2 verdict's scale-killer, now measured: the codebook is
    // IvfK hash-sampled centroids at ANY corpus size, so assignment is
    // O(N*k) and a 10x corpus costs ~10x — while the result is the same
    // 5-query top-10 table at both sizes (a linearly growing codebook
    // would instead blow the runtime bound quadratically)
    def run(df: DataFrame): Long =
      graft.operators.SimilarityQueries
        .ivfSearch(spark, df, df.filter($"vec_id" < 5)).count()
    val (small, big) = (vecCorpus(2000), vecCorpus(20000))
    run(small) // warmup
    spark.catalog.clearCache()
    val (tS, nS) = timed(run(small))
    val (tL, nL) = timed(run(big))
    info(f"s03: 1x -> ${tS}%.2f s / $nS rows, 10x -> ${tL}%.2f s / $nL rows")
    assert(nS === 50L && nL === 50L,
      s"IVF search must return 5 queries x top-10 at both sizes: $nS / $nL")
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"s03 runtime grew super-linearly: ${tS}%.2f s -> ${tL}%.2f s for 10x data")
  }

  test("s09 kNN graph: 10x corpus => ~10x runtime and edges") {
    // same K ~ 2*log2(n) - 10 bucket contract as d06; edge count is capped
    // at 5 per node, so it is exactly linear unless the bucket join floods
    assertTrend("s09",
      df => graft.operators.SimilarityQueries.knnGraph(spark, df,
        tables = 12, planesPerTable = 14).count(),
      vecCorpus(2000), vecCorpus(20000))
  }

  test("s11 semantic clusters: 10x corpus => ~10x runtime, one label per vector") {
    // the full composition (kNN edges -> mutual filter -> pointer-jumping
    // labels): output is exactly |V| labels, so linearity shows up purely
    // in the clock; the round count grows only with component diameter
    // (log-jumped), not corpus size
    assertTrend("s11",
      df => graft.operators.SimilarityQueries.semanticClusters(spark, df,
        tables = 12, planesPerTable = 14).count(),
      vecCorpus(2000), vecCorpus(20000))
  }

  test("auto-K geometry: the default EXECUTES the tuning contract at 10x growth") {
    // The round-8 verdict's one superlinear trend (s11 3.35x, d19 3.71x
    // per decade at the sf1 probe) was the kNN family running at FIXTURE
    // K while the corpus grew. The default is now AutoPlanes: K derived
    // from the corpus count. This test drives the same 2k/20k corpora as
    // the explicit-K trends above but with the DEFAULT geometry, asserting
    // (a) the derived K actually grows across the decade, and (b) runtime
    // and pair trends stay near-linear under the derived geometry.
    assert(DedupQueries.autoPlanesPerTable(2000) === 10)
    assert(DedupQueries.autoPlanesPerTable(20000) === 17)
    assertTrend("d06-auto",
      df => DedupQueries.embeddingLshPairs(spark, df, minCosMilli = 850L).count(),
      vecCorpus(2000), vecCorpus(20000))
    assertTrend("s09-auto",
      df => graft.operators.SimilarityQueries.knnGraph(spark, df).count(),
      vecCorpus(2000), vecCorpus(20000))
  }

  test("q48 pagerank: 10x graph => ~10x runtime, one rank per node") {
    // ring + one pseudo-random out-edge per node: |E| = 2|V| exactly, so
    // the 10 fixed iterations must each cost linear work; the output is
    // exactly |V| rank rows at both sizes (a flooded contribution join or
    // a dropped dangling node breaks the count before the clock moves)
    def graph(n: Long): DataFrame = spark.range(n).toDF("k")
    def run(nodes: DataFrame): Long = {
      val n = nodes.count()
      val mixUdf = org.apache.spark.sql.functions.udf(
        (i: Long) => math.floorMod(ScaleCorpus.mix(i), n))
      val edges = nodes.select($"k".as("src"), (($"k" + 1) % n).as("dst"),
          org.apache.spark.sql.functions.lit(1L).as("w"))
        .union(nodes.select($"k".as("src"), mixUdf($"k").as("dst"),
          org.apache.spark.sql.functions.lit(1L).as("w")))
      graft.operators.EventQueries.pageRank(nodes, edges, iters = 10).count()
    }
    val (small, big) = (graph(40000L), graph(400000L))
    run(small) // warmup
    spark.catalog.clearCache()
    val (tS, nS) = timed(run(small))
    val (tL, nL) = timed(run(big))
    info(f"q48: 1x -> ${tS}%.2f s / $nS ranks, 10x -> ${tL}%.2f s / $nL ranks")
    assert(nS === 40000L && nL === 400000L,
      s"pageRank must emit exactly one rank per node: $nS / $nL")
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"q48 runtime grew super-linearly: ${tS}%.2f s -> ${tL}%.2f s for 10x graph")
  }

  test("q54 triangles: 10x celebrity graph => ~10x runtime (orientation beats the hub)") {
    // Hub-and-ring: node 0 adjacent to ALL n leaves, leaves form a ring —
    // exactly n triangles (hub + each ring edge). An id-canonical
    // orientation would give the hub out-degree n and enumerate C(n,2)
    // wedges (5e9 at the large size — minutes, not seconds); the degree
    // ordering points every leaf AT the hub, so wedge work stays linear.
    def run(n: Long): Long = {
      val hub = spark.range(1, n + 1).select(
        org.apache.spark.sql.functions.lit(0L).as("u"), $"id".as("v"))
      val ring = spark.range(1, n).select($"id".as("u"), ($"id" + 1).as("v"))
        .union(Seq((1L, n)).toDF("u", "v"))
      val got = graft.operators.EventQueries.triangleCounts(hub.union(ring))
      assert(got.count() === n + 1, "one row per node")
      got.agg(org.apache.spark.sql.functions.sum($"n_tri")).head.getLong(0)
    }
    run(20000L) // warmup
    spark.catalog.clearCache()
    val (tS, triS) = timed(run(20000L))
    val (tL, triL) = timed(run(200000L))
    info(f"q54: 1x -> ${tS}%.2f s, 10x -> ${tL}%.2f s (hub degree 200k)")
    // n ring triangles, each counted at 3 member nodes
    assert(triS === 3 * 20000L && triL === 3 * 200000L)
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"q54 runtime grew super-linearly on the hub: ${tS}%.2f s -> ${tL}%.2f s")
  }

  test("q52 z-order rewrite: 10x rows => ~10x write time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale_z").toString
    def run(n: Long): Long = {
      val df = spark.range(n).select(
        ($"id" % 10000).as("a"),
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"id"),
          org.apache.spark.sql.functions.lit(10000L)).as("b"),
        $"id".as("x"))
      graft.operators.LayoutQueries.zOrderWrite(df, "a", "b", 16, s"$tmp/z_$n")
      spark.read.parquet(s"$tmp/z_$n").count()
    }
    run(60000L) // warmup
    val (tS, nS) = timed(run(60000L))
    val (tL, nL) = timed(run(600000L))
    info(f"q52 write: 1x -> ${tS}%.2f s / $nS rows, 10x -> ${tL}%.2f s / $nL rows")
    assert(nS === 60000L && nL === 600000L)
    assert(tL <= 25.0 * math.max(tS, 0.5),
      f"z-order write grew super-linearly: ${tS}%.2f s -> ${tL}%.2f s for 10x rows")
  }
}
