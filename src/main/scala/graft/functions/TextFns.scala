package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY.md §2.2 LLM
  * ops). Everything here is built from native Catalyst expressions
  * (`functions._` + higher-order array functions) — no Scala UDFs — so the
  * hot paths stay inside Catalyst optimization and distribute cleanly at
  * 100 TB: per-row, shuffle-free, no driver participation.
  */
object TextFns {

  /** Canonical form for dedup/fingerprinting: lowercase, trim, collapse
    * whitespace runs. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * Seq("  Hello   WORLD ").toDF("text")
    *   .select(TextFns.tokens($"text")).as[Seq[String]].head == Seq("hello", "world")
    * }}}
    */
  def tokens(c: Column): Column = split(normalize(c), " ")

  /** Distinct n-token shingles ("w1 w2 w3"). Docs shorter than n tokens
    * produce one partial shingle (concat_ws skips the nulls past the end —
    * same out-of-bounds => NULL semantics as DuckDB list indexing).
    *
    * PERFORMANCE WARNING: the lambda closes over the token-array
    * *expression*, and Catalyst inlines it — tokenization re-runs for every
    * element access (O(shingles x tokens) per doc). Reference semantics
    * only; hot paths build shingles in a typed map over a materialized
    * token column (see DedupQueries.docShingles, 30x faster at sf0.1). */
  def shingles(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
  }

  /** Jaccard similarity of two distinct-element arrays, in exact
    * integer-milli form: floor(1000 * |a∩b| / |a∪b|). */
  def jaccardMilli(a: Column, b: Column): Column =
    floor(size(array_intersect(a, b)) * lit(1000.0) / size(array_union(a, b)))
      .cast("long")

  /** Polynomial rolling hash of a string (mod 2^31-1), char-at-a-time:
    * acc = (acc * 31 + code) mod p. Reproducible in DuckDB via
    * list_reduce over the same char codes — used as an oracle-checkable
    * document fingerprint alongside md5. Backed by the codegen'd
    * [[PolyHashExpr]] (one fused loop; the higher-order formulation below
    * runs interpreted outside whole-stage codegen). */
  def polyHash(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      PolyHashExpr(org.apache.spark.sql.graft.Bridge.expression(c)))

  /** 64-bit SimHash of a token array (per-token FNV-1a, per-bit majority
    * vote), backed by the codegen'd [[SimHash64Expr]] so d04's signature
    * pass fuses into the corpus scan instead of a typed map. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SimHash64Expr(org.apache.spark.sql.graft.Bridge.expression(tokens)))

  /** Positional n-token shingle keys as 64-bit hashes (codegen'd
    * [[ShingleHashesExpr]]): output(i) keys the token window starting at i,
    * with no shingle string ever built. Join/group-key use only — see the
    * expression's equality/collision contract. */
  def shingleHashes(tokens: Column, n: Int = 8): Column =
    org.apache.spark.sql.graft.Bridge.column(
      ShingleHashesExpr(org.apache.spark.sql.graft.Bridge.expression(tokens), n))

  /** Content-defined chunk boundary positions (codegen'd
    * [[CdcBoundariesExpr]]): 1-indexed positions where the trailing-8-char
    * rolling hash is 0 mod 64 — t34's boundary rule in one fused loop per
    * document (the declarative filter/aggregate form runs its lambda
    * interpreted per character). */
  def cdcBoundaries(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CdcBoundariesExpr(org.apache.spark.sql.graft.Bridge.expression(c)))

  /** The original transform/aggregate formulation — kept as the
    * equivalence oracle for [[PolyHashExpr]] (VectorExprSpec). split("")
    * yields the char array in one O(n) pass; indexing with
    * substring(s, i, 1) instead is O(n) per char on UTF8 strings (O(n^2)
    * per doc — measured 23s vs ~1s over 5000 docs at sf0.1). */
  def polyHashInterpreted(c: Column): Column = {
    val codes = transform(split(c, ""), ch => ascii(ch))
    aggregate(codes, lit(0L), (acc, code) => pmod(acc * 31 + code, lit(2147483647L)))
  }

  /** Count of matches of a BPE-ish word/number/punct pre-tokenizer regex —
    * a cheap token-count proxy when no tokenizer model is loadable. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(c: Column): Column = regexp_count(c, lit(BpeishPattern))

  /** PII detector patterns — restricted to the regex dialect subset (char
    * classes, bounded repeats, no backrefs/lookaround) that Java regex and
    * DuckDB's RE2 interpret identically, the same cross-engine contract as
    * [[BpeishPattern]]. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def piiEmails(c: Column): Column = regexp_count(c, lit(EmailPattern)).cast("long")
  def piiIpv4s(c: Column): Column = regexp_count(c, lit(Ipv4Pattern)).cast("long")
  def piiPhones(c: Column): Column = regexp_count(c, lit(PhonePattern)).cast("long")

  /** Language stopword-hit scores. The tie-break chain (en > es > de > fr >
    * zh) is deterministic and mirrored in the SQL oracle. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un", "est"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有"))

  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*))).cast("long")

  /** DuckDB replay of [[langId]]'s scoring: the per-language stopword-hit
    * counts over token-list column `tokCol`, aliased `s_<lang>` — pairs
    * with [[langPickSql]] in every oracle that replays language-ID
    * (t01/t05/t35/t38/d19). */
  def langScoreSql(tokCol: String = "t"): String =
    StopwordSets.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($tokCol, $arr)) AS s_$l"
    }.mkString(",\n                 ")

  /** DuckDB replay of [[langIdTokens]]'s argmax: the declaration-order
    * first-wins pick over [[langScoreSql]]'s `s_<lang>` aliases. */
  def langPickSql: String = {
    val langs = StopwordSets.map(_._1)
    langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
      case ((l, i), els) =>
        val later = langs.drop(i + 1).map(x => s"s_$x").mkString("greatest(", ", ", ")")
        s"CASE WHEN s_$l >= $later THEN '$l' ELSE $els END"
    }
  }

  /** Predicted language by max stopword hits with the deterministic
    * tie-break order above. */
  def langId(c: Column): Column = langIdTokens(tokens(c))

  /** [[langId]] over an already-tokenized array — lets chunk-level callers
    * (t35 code-switch detection) score token windows without re-splitting. */
  def langIdTokens(t: Column): Column = {
    val scores = StopwordSets.map { case (l, ws) => (l, stopwordHits(t, ws)) }
    // lang whose score is >= all later langs' scores, first wins
    scores.init.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((l, sc), i), els) =>
        val laterMax = scores.drop(i + 1).map(_._2).reduce((x, y) => greatest(x, y))
        when(sc >= laterMax, lit(l)).otherwise(els)
    }
  }
}
