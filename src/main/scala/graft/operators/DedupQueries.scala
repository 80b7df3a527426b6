package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deduplication operators over `documents` / `embeddings` (SURVEY.md §2.2
  * LLM ops): exact, n-gram-Jaccard (exact quadratic baseline, blocked),
  * MinHash+LSH (the 100 TB scale path — shuffle on band buckets instead of
  * all-pairs), SimHash chunk-blocking, and embedding-cosine near-dup.
  *
  * Scale design: the quadratic baseline exists only as a correctness anchor
  * (benchmark=false); MinHash-LSH turns near-dup search into
  * explode(bands) + equi-join on (band, hash) — a plain shuffle join Spark
  * distributes and AQE skew-handles. SimHash's 4×16-bit chunk blocking has a
  * pigeonhole guarantee: hamming ≤ 3 implies ≥ 1 identical chunk, so the
  * blocked join finds exactly the hamming ≤ 3 pairs.
  */
object DedupQueries {

  private val P = 2147483647L // 2^31 - 1
  private val NumHashes = 48
  private val Bands = 16 // x 3 rows; P(miss | j=0.8) ≈ 1e-5, j=0.9 ≈ 1e-9

  /** Deterministic affine minhash params (fixed-seed LCG, driver-side). */
  private val (hashA, hashB): (Array[Long], Array[Long]) = {
    var s = 42L
    def next(bound: Long): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % bound + bound) % bound
    }
    val a = Array.fill(NumHashes)(next(1 << 20) + 1) // nonzero, < 2^20: no overflow in a*h
    val b = Array.fill(NumHashes)(next(P))
    (a, b)
  }

  /** 48-element minhash signature of a distinct-shingle array. One xxhash64
    * per shingle, then cheap affine maps — all native expressions. */
  def minhashSig(sh: Column): Column = {
    val hs = transform(sh, x => pmod(xxhash64(x), lit(P)))
    array((0 until NumHashes).map { i =>
      array_min(transform(hs, h => pmod(h * hashA(i) + hashB(i), lit(P))))
    }: _*)
  }

  /** Band hashes (16 bands of 3 signature rows each). */
  def bandHashes(sig: Column): Column =
    array((0 until Bands).map { j =>
      xxhash64(lit(j), element_at(sig, j * 3 + 1), element_at(sig, j * 3 + 2),
        element_at(sig, j * 3 + 3))
    }: _*)

  /** 64-bit SimHash from token multiset: bit b is set iff the sum over
    * tokens of ±1 (by bit b of the token's hash) is positive. Per-bit
    * literal masks (not column-valued shifts) keep it all native exprs. */
  def simhash(toksCol: Column): Column = {
    val hs = transform(toksCol, t => xxhash64(t))
    (0 until 64).map { b =>
      val mask = lit(1L << b)
      when(
        aggregate(hs, lit(0L),
          (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0, 1L).otherwise(-1L)) > 0,
        mask).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  private def docShingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"lang", TextFns.shingles($"text", 3).as("sh"))
  }

  /** Exact-jaccard verified pair set — shared by the quadratic baseline and
    * as the LSH verification step. */
  private val PairSql = """
        WITH toks AS (
          SELECT doc_id, lang,
                 string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, lang,
                 list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
          FROM toks)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(floor(len(list_intersect(a.s, b.s)) * 1000.0 /
                 len(list_distinct(list_concat(a.s, b.s)))) AS BIGINT) AS j_milli
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE floor(len(list_intersect(a.s, b.s)) * 1000.0 /
                 len(list_distinct(list_concat(a.s, b.s)))) >= 800
        ORDER BY doc_a, doc_b"""

  val all: Seq[QueryDef] = Seq(

    // ----- exact dedup: hash-groupBy on the normalized text -----------------
    QueryDef(
      "d01_dedup_exact",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(TextFns.normalize($"text"))).as("n_distinct"),
            (count(lit(1)) - countDistinct(md5(TextFns.normalize($"text")))).as("n_exact_dups"))
          .orderBy($"source")
      },
      oracle = Some("""
        SELECT source, count(*) AS n_docs,
               count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct,
               count(*) - count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_exact_dups
        FROM documents
        GROUP BY source
        ORDER BY source""")),

    // ----- n-gram Jaccard near-dup: exact quadratic baseline, lang-blocked --
    QueryDef(
      "d02_dedup_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        val sh = docShingles(s, d)
        val a = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
        val b = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
        a.join(b, $"doc_a" < $"doc_b")
          .select($"doc_a", $"doc_b", TextFns.jaccardMilli($"sh_a", $"sh_b").as("j_milli"))
          .filter($"j_milli" >= 800)
          .orderBy($"doc_a", $"doc_b")
      },
      oracle = Some(PairSql),
      benchmark = false), // exact quadratic baseline; LSH (d03) is the scale path

    // ----- MinHash + LSH near-dup: the scale path ---------------------------
    // Candidates come from an equi-join on (band, band_hash); exact jaccard
    // verification then removes LSH false positives, so the result equals the
    // quadratic baseline (same oracle) with P(missed pair) ~ 1e-5.
    QueryDef(
      "d03_dedup_minhash_lsh",
      (s, d) => {
        import s.implicits._
        val sh = docShingles(s, d)
        val withBands = sh
          .withColumn("bands", bandHashes(minhashSig($"sh")))
          .select($"doc_id", $"lang", $"sh", posexplode($"bands").as(Seq("band", "bh")))
        val l = withBands.select($"band", $"bh", $"doc_id".as("doc_a"), $"sh".as("sh_a"))
        val r = withBands.select($"band", $"bh", $"doc_id".as("doc_b"), $"sh".as("sh_b"))
        l.join(r, Seq("band", "bh"))
          .filter($"doc_a" < $"doc_b")
          .select($"doc_a", $"doc_b", $"sh_a", $"sh_b").distinct()
          .select($"doc_a", $"doc_b", TextFns.jaccardMilli($"sh_a", $"sh_b").as("j_milli"))
          .filter($"j_milli" >= 800)
          .orderBy($"doc_a", $"doc_b")
      },
      oracle = Some(PairSql)),

    // ----- SimHash near-dup: hamming<=3 via 4x16-bit chunk pigeonhole -------
    // xxhash64-based => not SQL-reproducible; rows-only here, invariants in
    // SimhashSpec (subset/superset relations vs the jaccard baseline).
    QueryDef(
      "d04_dedup_simhash",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"doc_id", $"lang", simhash(TextFns.tokens($"text")).as("sig"))
        val chunked = docs.select($"doc_id", $"lang", $"sig",
          posexplode(array((0 until 4).map(c =>
            shiftright($"sig", c * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("chunk", "cv")))
        val l = chunked.select($"chunk", $"cv", $"doc_id".as("doc_a"), $"sig".as("sig_a"))
        val r = chunked.select($"chunk", $"cv", $"doc_id".as("doc_b"), $"sig".as("sig_b"))
        l.join(r, Seq("chunk", "cv"))
          .filter($"doc_a" < $"doc_b")
          .select($"doc_a", $"doc_b", $"sig_a", $"sig_b").distinct()
          .select($"doc_a", $"doc_b",
            bit_count($"sig_a".bitwiseXOR($"sig_b")).cast("long").as("hamming"))
          .filter($"hamming" <= 3)
          .orderBy($"doc_a", $"doc_b")
      },
      oracle = None),

    // ----- embedding-cosine near-dup ----------------------------------------
    QueryDef(
      "d05_dedup_embedding_cosine",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        val a = e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"), $"label".as("label_a"))
        val b = e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"))
        a.join(b, $"vec_a" < $"vec_b")
          .select($"vec_a", $"vec_b", VectorFns.cosineMilli($"emb_a", $"emb_b").as("cos_milli"))
          .filter($"cos_milli" >= 400)
          .orderBy($"vec_a", $"vec_b")
      },
      oracle = Some("""
        WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(floor(list_dot_product(a.e, b.e) * 1000.0 /
                 (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))) AS BIGINT) AS cos_milli
        FROM t a JOIN t b ON a.vec_id < b.vec_id
        WHERE floor(list_dot_product(a.e, b.e) * 1000.0 /
                 (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))) >= 400
        ORDER BY vec_a, vec_b""")))
}
