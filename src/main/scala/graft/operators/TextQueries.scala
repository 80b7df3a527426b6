package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2.2 LLM ops):
  * language-ID (stopword heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting (md5 +
  * polynomial rolling hash). All native expressions; per-row, shuffle-free
  * until the final aggregate.
  */
object TextQueries {

  /** The admission feature projection — one narrow per-row pass shared by
    * batch t05 and its streaming upsert twin (StreamAdmission): content
    * key for canonical-copy selection, predicted language, and the quality
    * signals. All deterministic per row, so batch/stream results agree
    * regardless of how the corpus is split into micro-batches. */
  def admissionFeatures(docs: DataFrame): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val nToks = size(t).cast("long")
    val distinctRatio = floor(size(array_distinct(t)) * lit(1000.0) / size(t)).cast("long")
    docs.select(col("doc_id"),
      md5(TextFns.normalize(col("text"))).as("content_key"),
      TextFns.langId(col("text")).as("predicted_lang"),
      nToks.as("n_tokens"),
      distinctRatio.as("distinct_ratio_milli"))
  }

  /** t05's admission gate over the feature columns. */
  def admissionGate: Column = col("n_tokens") >= 20 && col("distinct_ratio_milli") >= 200

  val all: Seq[QueryDef] = Seq(

    // ----- language identification (stopword heuristic) ---------------------
    QueryDef(
      "t01_lang_id",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"lang".as("labeled"), TextFns.langId($"text").as("predicted"))
          .groupBy($"labeled", $"predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy($"labeled", $"predicted")
      },
      oracle = Some {
        val scoreExprs = TextFns.StopwordSets.map { case (l, ws) =>
          val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_intersect(t, $arr)) AS s_$l"
        }.mkString(",\n                 ")
        val langs = TextFns.StopwordSets.map(_._1)
        val pick = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
          case ((l, i), els) =>
            val later = langs.drop(i + 1).map(x => s"s_$x").mkString("greatest(", ", ", ")")
            s"CASE WHEN s_$l >= $later THEN '$l' ELSE $els END"
        }
        s"""
        WITH toks AS (
          SELECT lang AS labeled,
                 string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
          FROM documents),
        scored AS (
          SELECT labeled,
                 $scoreExprs
          FROM toks)
        SELECT labeled, $pick AS predicted, count(*) AS n
        FROM scored
        GROUP BY 1, 2
        ORDER BY labeled, predicted"""
      }),

    // ----- quality scoring ---------------------------------------------------
    QueryDef(
      "t02_quality_score",
      (s, d) => {
        import s.implicits._
        val t = TextFns.tokens($"text")
        val nToks = size(t).cast("long")
        val distinctRatio = floor(size(array_distinct(t)) * lit(1000.0) / size(t)).cast("long")
        val meanTokLen = floor(
          aggregate(t, lit(0L), (acc, x) => acc + length(x)) * lit(1000.0) / size(t)).cast("long")
        val stopHits = TextFns.StopwordSets.map { case (_, ws) => TextFns.stopwordHits(t, ws) }
          .reduce(_ + _)
        Tables.documents(s, d)
          .select($"doc_id", $"n_chars",
            nToks.as("n_tokens"),
            distinctRatio.as("distinct_ratio_milli"),
            meanTokLen.as("mean_token_len_milli"),
            stopHits.as("stopword_kinds"),
            (nToks >= 20 && distinctRatio >= 200).cast("long").as("passes_quality"))
          .orderBy($"doc_id")
      },
      oracle = Some {
        val stopArrs = TextFns.StopwordSets.map { case (_, ws) =>
          val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_intersect(t, $arr))"
        }.mkString(" + ")
        s"""
        WITH toks AS (
          SELECT doc_id, n_chars,
                 string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
          FROM documents)
        SELECT doc_id, n_chars,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(floor(len(list_distinct(t)) * 1000.0 / len(t)) AS BIGINT) AS distinct_ratio_milli,
               CAST(floor(list_reduce(list_prepend(0, list_transform(t, x -> length(x))),
                 (acc, x) -> acc + x) * 1000.0 / len(t)) AS BIGINT) AS mean_token_len_milli,
               CAST($stopArrs AS BIGINT) AS stopword_kinds,
               CAST(len(t) >= 20 AND floor(len(list_distinct(t)) * 1000.0 / len(t)) >= 200 AS BIGINT) AS passes_quality
        FROM toks
        ORDER BY doc_id"""
      }),

    // ----- corpus filter: the composed training-data admission pipeline -----
    // What the individual operators exist FOR: keep exactly the documents
    // that (a) are the canonical copy of their content group (d07 logic),
    // and (b) pass the quality gate (t02 logic), labeled with predicted
    // language (t01 logic). One narrow feature projection, one hash agg
    // for canonicals, one equi-join — linear and shuffle-minimal at any
    // scale.
    QueryDef(
      "t05_corpus_filter",
      (s, d) => {
        import s.implicits._
        val scored = admissionFeatures(Tables.documents(s, d))
        val canon = scored.groupBy($"content_key").agg(min($"doc_id").as("doc_id"))
        scored.join(canon, Seq("content_key", "doc_id"))
          .filter(admissionGate)
          .select($"doc_id", $"predicted_lang", $"n_tokens")
          .orderBy($"doc_id")
      },
      oracle = Some {
        val scoreExprs = TextFns.StopwordSets.map { case (l, ws) =>
          val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_intersect(t, $arr)) AS s_$l"
        }.mkString(",\n                 ")
        val langs = TextFns.StopwordSets.map(_._1)
        val pick = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
          case ((l, i), els) =>
            val later = langs.drop(i + 1).map(x => s"s_$x").mkString("greatest(", ", ", ")")
            s"CASE WHEN s_$l >= $later THEN '$l' ELSE $els END"
        }
        s"""
        WITH toks AS (
          SELECT doc_id,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_key,
                 string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
          FROM documents),
        feats AS (
          SELECT doc_id, content_key,
                 CAST(len(t) AS BIGINT) AS n_tokens,
                 CAST(floor(len(list_distinct(t)) * 1000.0 / len(t)) AS BIGINT) AS distinct_ratio_milli,
                 $scoreExprs
          FROM toks),
        canon AS (SELECT content_key, min(doc_id) AS doc_id FROM feats GROUP BY content_key)
        SELECT f.doc_id, $pick AS predicted_lang, f.n_tokens
        FROM feats f JOIN canon c ON f.content_key = c.content_key AND f.doc_id = c.doc_id
        WHERE f.n_tokens >= 20 AND f.distinct_ratio_milli >= 200
        ORDER BY f.doc_id"""
      }),

    // ----- token counting: whitespace + BPE-ish regex ------------------------
    QueryDef(
      "t03_token_counts",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"lang",
            size(TextFns.tokens($"text")).cast("long").as("ws_tokens"),
            TextFns.bpeishCount($"text").cast("long").as("bpeish_tokens"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"ws_tokens").as("total_ws_tokens"),
            sum($"bpeish_tokens").as("total_bpeish_tokens"))
          .orderBy($"lang")
      },
      oracle = Some(s"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS BIGINT) AS total_ws_tokens,
               CAST(sum(len(regexp_extract_all(text, '${TextFns.BpeishPattern}'))) AS BIGINT) AS total_bpeish_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // ----- document fingerprinting: md5 + polynomial rolling hash ------------
    QueryDef(
      "t04_fingerprint",
      (s, d) => {
        import s.implicits._
        val norm = TextFns.normalize($"text")
        Tables.documents(s, d)
          .select($"doc_id", md5(norm).as("md5_fp"), TextFns.polyHash(norm).as("poly_fp"))
          .orderBy($"doc_id")
      },
      oracle = Some("""
        WITH n AS (
          SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
          FROM documents)
        SELECT doc_id, md5(s) AS md5_fp,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, length(s)),
                     i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
                 (acc, c) -> (acc * 31 + c) % 2147483647) AS poly_fp
        FROM n
        ORDER BY doc_id""")))
}
