package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._
import graft.functions.{GraftFunctions => G}

/** Text-analysis family for the training-data pipeline (builder brief):
  * token counting, quality scoring, language ID — all composed from
  * codegen'd built-ins (no UDFs), each oracle-checked against DuckDB
  * over `documents.parquet`.
  */
object TextAnalysis {

  private val stopEn = Seq("the", "and", "is", "of", "to", "in", "a", "for", "on", "with")
  private def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")

  /** Token counting: whitespace tokens + a BPE-ish subword count
    * (word runs / single digits / punctuation pieces).
    */
  val t01 = Q("t01_token_counts",
    (s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          G.tokenCount(col("text")).as("n_tokens"),
          G.bpeishTokenCount(col("text")).as("n_bpeish"),
          length(col("text")).cast("long").as("n_chars_actual"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{024F}]+|[0-9]|[^A-Za-z0-9\s]', 0)) AS BIGINT) AS n_bpeish,
        CAST(length(text) AS BIGINT) AS n_chars_actual
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: length component, punctuation ratio, stopword
    * ratio, composite score (reference quality heuristics re-expressed
    * as pure column arithmetic; same formula both engines).
    */
  val t02 = Q("t02_quality_scores",
    (s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          round(G.punctRatio(col("text")), 6).as("punct_ratio"),
          round(G.stopwordRatio(col("text"), stopEn), 6).as("stopword_ratio"),
          G.qualityScore(col("text"), stopEn).as("quality_score"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
        ROUND(punct, 6) AS punct_ratio,
        ROUND(sw_ratio, 6) AS stopword_ratio,
        ROUND(0.4 * LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
            + 0.3 * (1.0 - punct)
            + 0.3 * LEAST(sw_ratio / 0.1, 1.0), 6) AS quality_score
      FROM (
        SELECT doc_id, text,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)
                    / length(text) END AS punct,
          CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) = 0 THEN 0.0
               ELSE CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                          x -> x IN (${inList(stopEn)}))) AS DOUBLE)
                    / len(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS sw_ratio
        FROM documents) t
      ORDER BY doc_id"""))

  /** Language ID: stopword-marker argmax with deterministic tie-break
    * (first language in registration order wins ties; 'und' on zero hits).
    */
  val t03 = Q("t03_lang_id",
    (s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), G.langId(col("text")).as("pred"))
        .orderBy(col("doc_id"))
    },
    Some {
      val scores = G.langMarkers.map { case (code, markers) =>
        s"CAST(len(list_filter(toks, x -> x IN (${inList(markers)}))) AS BIGINT) AS s_$code"
      }.mkString(",\n          ")
      val codes = G.langMarkers.map(_._1)
      val best = s"GREATEST(${codes.map("s_" + _).mkString(", ")})"
      val pick = codes.map(c => s"WHEN s_$c = best THEN '$c'").mkString(" ")
      s"""
      SELECT doc_id, lang,
        CASE WHEN best = 0 THEN 'und' $pick END AS pred
      FROM (
        SELECT doc_id, lang, $best AS best,
          ${codes.map("s_" + _).mkString(", ")}
        FROM (
          SELECT doc_id, lang,
            $scores
          FROM (SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents) a) b) c
      ORDER BY doc_id"""
    })

  def qs: Seq[Q] = Seq(t01, t02, t03)
}
