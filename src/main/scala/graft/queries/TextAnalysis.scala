package graft.queries

import org.apache.spark.sql.expressions.Window
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

  /** Corpus distribution stats: exact token-count percentiles per
    * language (curation decisions — length cutoffs, sampling weights —
    * are made off these). Exact `percentile`, not approx, so the DuckDB
    * `quantile_cont` oracle hash-matches; at 100 TB the same shape runs
    * with `percentile_approx` at a declared error bound.
    */
  val t04 = Q("t04_token_percentiles",
    (s, dir) => {
      load(s, dir, "documents")
        .select(col("lang"), G.tokenCount(col("text")).as("nt"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(nt, 0.25)"), 6).as("p25"),
          round(expr("percentile(nt, 0.5)"), 6).as("p50"),
          round(expr("percentile(nt, 0.75)"), 6).as("p75"),
          round(expr("percentile(nt, 0.95)"), 6).as("p95"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
        ROUND(quantile_cont(nt, 0.25), 6) AS p25,
        ROUND(quantile_cont(nt, 0.5), 6) AS p50,
        ROUND(quantile_cont(nt, 0.75), 6) AS p75,
        ROUND(quantile_cont(nt, 0.95), 6) AS p95
      FROM (SELECT lang,
              CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
            FROM documents) t
      GROUP BY lang ORDER BY lang"""))

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences (2048 here) by exclusive prefix sum within each
    * language — one window shuffle, deterministic bin ids, no driver
    * loop. The packer every LLM data pipeline runs before tokenizer
    * sharding.
    */
  val t05 = Q("t05_sequence_packing",
    (s, dir) => {
      val budget = 2048L
      val byDoc = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), G.tokenCount(col("text")).as("nt"))
        .withColumn("cum", sum(col("nt")).over(byDoc))
        .select(col("doc_id"), col("lang"), col("nt"),
          floor((col("cum") - col("nt")) / lit(budget.toDouble)).cast("long").as("seq_id"))
        .withColumn("pos_in_seq",
          row_number().over(Window.partitionBy(col("lang"), col("seq_id"))
            .orderBy(col("doc_id"))).cast("long"))
        .orderBy(col("lang"), col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
        FROM documents),
      c AS (
        SELECT doc_id, lang, nt,
          CAST(SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
        FROM t)
      SELECT doc_id, lang, nt,
        CAST(FLOOR((cum - nt) / 2048.0) AS BIGINT) AS seq_id,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY lang, CAST(FLOOR((cum - nt) / 2048.0) AS BIGINT)
          ORDER BY doc_id) AS BIGINT) AS pos_in_seq
      FROM c ORDER BY lang, doc_id"""))

  /** PII redaction: plant a deterministic email/phone/CPF tail per
    * document, then scrub with a regexp_replace chain (all-codegen,
    * patterns kept to the RE2 ∩ java.util.regex common dialect so the
    * oracle applies the identical rules).
    */
  val t06 = Q("t06_pii_redact",
    (s, dir) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+55 [0-9]{2} 9[0-9]{4}-[0-9]{4}"
      val cpfRe = "[0-9]{3}\\.[0-9]{3}\\.[0-9]{3}-[0-9]{2}"
      load(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +55 11 9"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit("-"), lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
            lit(" cpf 123.456.789-"),
            lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0")).as("text"))
        .select(col("doc_id"),
          (size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            + size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))
            + size(regexp_extract_all(col("text"), lit(cpfRe), lit(0)))).cast("long").as("n_pii"),
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), cpfRe, "<CPF>").as("clean_text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH planted AS (
        SELECT doc_id,
          concat(text, ' contact user', doc_id, '@example.com or +55 11 9',
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), '-',
            lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0'),
            ' cpf 123.456.789-',
            lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')) AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0))
           + len(regexp_extract_all(text, '\+55 [0-9]{2} 9[0-9]{4}-[0-9]{4}', 0))
           + len(regexp_extract_all(text, '[0-9]{3}\.[0-9]{3}\.[0-9]{3}-[0-9]{2}', 0)) AS BIGINT) AS n_pii,
        regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+55 [0-9]{2} 9[0-9]{4}-[0-9]{4}', '<PHONE>', 'g'),
          '[0-9]{3}\.[0-9]{3}\.[0-9]{3}-[0-9]{2}', '<CPF>', 'g') AS clean_text
      FROM planted ORDER BY doc_id"""))

  /** Deterministic stratified sampling: per-language keep rates
    * applied through a multiplicative hash of the doc id (Knuth
    * constant, d07's split convention) — reproducible across engines
    * and runs, no RNG state, trivially parallel. The training-mix
    * shape: downsample over-represented strata (en) harder than rare
    * ones (fr), with the expected rate checked per stratum.
    */
  val t07 = Q("t07_stratified_sample",
    (s, dir) => {
      val rates = typedlit(Map("en" -> 30L, "de" -> 60L, "es" -> 60L,
        "fr" -> 90L, "zh" -> 60L))
      load(s, dir, "documents")
        .withColumn("keep_rate", element_at(rates, col("lang")))
        .filter(pmod(col("doc_id") * lit(2654435761L), lit(100L)) < col("keep_rate"))
        .select(col("doc_id"), col("lang"), col("keep_rate"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang, keep_rate FROM (
        SELECT doc_id, lang,
          CAST(CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 60 WHEN 'es' THEN 60
                    WHEN 'fr' THEN 90 WHEN 'zh' THEN 60 END AS BIGINT) AS keep_rate
        FROM documents) t
      WHERE (doc_id * 2654435761) % 100 < keep_rate
      ORDER BY doc_id"""))

  /** Heavy hitters over corpus tokens ([[graft.ops.Frequency]]): every
    * token above 1/500 of the corpus, with EXACT counts — per-partition
    * Misra-Gries candidates bound the shuffle to ≤ k·partitions rows
    * (vs one per distinct token), then a broadcast-semi-join recount
    * makes the result exact, so the plain HAVING oracle hash-matches.
    * Same tokenization as t03 (lower + \s+ split).
    */
  val t08 = Q("t08_heavy_hitters",
    (s, dir) => {
      val toks = load(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      graft.ops.Frequency.heavyHitters(toks, "token", k = 499)
        .orderBy(col("freq").desc, col("token"))
    },
    Some("""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents)
      SELECT token, COUNT(*) AS freq
      FROM toks
      GROUP BY token
      HAVING COUNT(*) * 500 > (SELECT COUNT(*) FROM toks)
      ORDER BY freq DESC, token"""))

  /** t04's scale path beside its exact twin (the q25/q29 stance for
    * quantiles): approx_percentile is a mergeable bounded-memory sketch
    * — the only viable form at 100 TB — while the exact percentile
    * requires the full sorted group. Sketch output is engine-specific,
    * so rows-only here with the rank-error bound asserted IN the row
    * (the sketch guarantees ±accuracy⁻¹ in RANK, checked against the
    * exact CDF position, not the value).
    */
  val t09 = Q("t09_approx_percentiles",
    (s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("lang"), G.tokenCount(col("text")).as("nt"))
      val stats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(nt, 0.5)").as("p50_exact"),
          expr("approx_percentile(nt, 0.5, 1000)").as("p50_approx"))
      // rank of the sketch's answer within the group vs the true median
      // rank: |rank(approx)/n - 0.5| must be inside the sketch bound
      docs.join(stats, Seq("lang"))
        .groupBy(col("lang"), col("n_docs"), col("p50_exact"), col("p50_approx"))
        .agg((sum(when(col("nt") <= col("p50_approx"), 1L).otherwise(0L)) /
          count(lit(1))).as("cdf_at_approx"))
        .withColumn("rank_err", abs(col("cdf_at_approx") - 0.5))
        .withColumn("within_bound",
          col("rank_err") <= lit(0.01) + lit(1.0) / col("n_docs"))
        .orderBy(col("lang"))
    },
    None)

  /** Vocabulary coverage: the exact top-100 tokens by frequency with
    * each prefix's cumulative share of the corpus — the curve a
    * tokenizer-vocab cutoff is read off. The top-k is orderBy+limit on
    * the aggregated counts (Spark's TakeOrdered: per-partition heaps,
    * driver merges k·P candidates — never a global sort), and only the
    * 100 survivors enter the ordered window for the cumulative share.
    */
  val t10 = Q("t10_vocab_coverage",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = load(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      val top = counts.orderBy(col("freq").desc, col("token")).limit(100)
      val total = toks.agg(count(lit(1)).as("_total"))
      val w = Window.partitionBy(col("_all"))
        .orderBy(col("freq").desc, col("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(total))
        .withColumn("_all", lit(0))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum_share",
          round(sum(col("freq")).over(w).cast("double") / col("_total"), 6))
        .select(col("rank"), col("token"), col("freq"), col("cum_share"))
        .orderBy(col("rank"))
    },
    Some("""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents),
      counts AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY 1),
      top AS (
        SELECT token, freq FROM counts
        ORDER BY freq DESC, token LIMIT 100),
      tot AS (SELECT COUNT(*) AS total FROM toks)
      SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank, token, freq,
        ROUND(CAST(SUM(freq) OVER w AS DOUBLE) / tot.total, 6) AS cum_share
      FROM top, tot
      WINDOW w AS (ORDER BY freq DESC, token
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY rank"""))

  /** Token-rarity scoring: each document's mean token DOCUMENT
    * FREQUENCY share — a corpus-calibrated quality signal (low score =
    * mostly rare/OOV-ish tokens; the statistical cousin of t02's
    * hand-tuned heuristics, with the corpus itself as the model). Two
    * aggregations: per-token df over distinct (doc, token) pairs, then
    * a per-doc mean through the exact-decimal path so cross-partition
    * order can't perturb the hash. No log/exp anywhere — the score is
    * pure rational arithmetic, so the oracle matches bit-for-bit.
    */
  val t11 = Q("t11_rarity_score",
    (s, dir) => {
      val docTok = load(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .distinct()
      val nDocs = load(s, dir, "documents").agg(count(lit(1)).as("_n"))
      val dfs = docTok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      docTok.join(dfs, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .withColumn("share", round(col("df").cast("double") / col("_n"), 6))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct_tokens"),
          // 6-dp-rounded doubles cast EXACTLY to DECIMAL(18,6): the sum
          // is associative and no second rounding can sit on a boundary
          round(sum(col("share").cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(18, 6))).cast("double") / count(lit(1)), 6)
            .as("mean_df_share"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH doc_tok AS (
        SELECT DISTINCT doc_id,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents),
      dfs AS (SELECT token, COUNT(*) AS df FROM doc_tok GROUP BY 1),
      n AS (SELECT COUNT(*) AS total FROM documents)
      SELECT doc_id, COUNT(*) AS n_distinct_tokens,
        ROUND(CAST(SUM(CAST(ROUND(CAST(df AS DOUBLE) / n.total, 6) AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(*), 6) AS mean_df_share
      FROM doc_tok JOIN dfs USING (token), n
      GROUP BY doc_id, n.total ORDER BY doc_id"""))

  /** Repetition quality stats (the Gopher/MassiveText rules re-expressed
    * relationally): per document, the share of bigram occurrences taken
    * by the single most frequent bigram, and the share of trigram
    * occurrences whose trigram repeats within the document. High values
    * flag boilerplate/spam long before any model sees the text. Two
    * explode→count pipelines joined on doc_id — the per-(doc, gram)
    * aggregation is map-side-combinable and the join keys are the
    * grouping keys, so no extra shuffle; at 100 TB this is the same
    * plan, just wider.
    */
  val t12 = Q("t12_repetition_stats",
    (s, dir) => {
      graft.ops.Curation.repetitionStats(
          load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
          round(col("dup_trigram_frac"), 6).as("dup_trigram_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
          i -> ws[i] || ' ' || ws[i+1])) AS g
        FROM t),
      bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      b AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS tot2 FROM bgc GROUP BY 1),
      tg AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        FROM t),
      tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
      tr AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupc,
               SUM(c) AS tot3 FROM tgc GROUP BY 1)
      SELECT doc_id,
        ROUND(CAST(topc AS DOUBLE) / tot2, 6) AS top_bigram_frac,
        ROUND(CAST(dupc AS DOUBLE) / tot3, 6) AS dup_trigram_frac
      FROM b JOIN tr USING (doc_id) ORDER BY doc_id"""))

  /** Per-GROUP heavy hitters through the native mergeable aggregate
    * ([[graft.functions.MisraGriesTopK]] — t08's Misra-Gries, but as a
    * real TypedImperativeAggregate the optimizer treats like `sum`:
    * bounded state per partial, map-side combine, one per grouping
    * key). Candidates are recounted EXACTLY and row_number'd to the
    * top 5 per language — so IF the candidate set covers the true
    * top-5, the result is exact and the plain window oracle
    * hash-matches. MG only GUARANTEES presence above n/(k+1) (~0.5%
    * of a group's tokens at k=200), so the prune is CERTIFIED before
    * it is trusted: per language, the 5th candidate's exact count must
    * clear the miss bound n_lang/(k+1) — then no absent token can
    * displace the top 5. A language that fails the certificate (a
    * spectrum flat enough that its top-5 sits below ~0.5% — where
    * heavy-hitter pruning buys nothing anyway) falls back to the exact
    * per-token groupBy, keeping the result exact AT EVERY SCALE
    * instead of only where the sketch happens to hold. The certificate
    * read is one row per language (bounded driver pull); n_lang rides
    * the same aggregate as the MG pass, so certification adds no scan.
    */
  val t13 = Q("t13_group_heavy_hitters",
    (s, dir) => {
      val mgK = 200
      val toks = load(s, dir, "documents")
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      def exactTop5(counts: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("freq").desc, col("token"))
        counts.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("lang"), col("rank"), col("token"), col("freq"))
          .orderBy(col("lang"), col("rank"))
      }
      val agg1 = toks.groupBy(col("lang"))
        .agg(G.mgTopK(col("token"), mgK).as("cands"),
          count(lit(1)).as("n_lang"))
      val cand = agg1
        .select(col("lang"), explode(col("cands")).as("c"))
        .select(col("lang"), col("c.item").as("token"))
      val counts = graft.ops.cacheOnce(
        toks.join(broadcast(cand), Seq("lang", "token"))
          .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("freq")))
      val pruned = exactTop5(counts)
      val certified = pruned.groupBy(col("lang"))
        .agg(min(col("freq")).as("f5"), count(lit(1)).as("n_ranked"))
        .join(agg1.select(col("lang"), col("n_lang")), Seq("lang"))
        .select(col("lang"),
          (col("n_ranked") === 5 &&
            col("f5") * (mgK + 1) > col("n_lang")).as("ok"))
        .collect() // one row per language
      if (certified.forall(_.getBoolean(1))) pruned
      else exactTop5(
        toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("freq")))
    },
    Some("""
      WITH toks AS (
        SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents),
      counts AS (SELECT lang, token, COUNT(*) AS freq FROM toks GROUP BY 1, 2),
      ranked AS (
        SELECT lang, token, freq,
          CAST(ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY freq DESC, token) AS INT) AS rank
        FROM counts)
      SELECT lang, rank, token, freq FROM ranked
      WHERE rank <= 5 ORDER BY lang, rank"""))

  /** Script detection from text content (no metadata): per-document
    * share of Latin / CJK / Cyrillic / digit code points, and the
    * dominant-script verdict that drives shingling strategy
    * ([[graft.api.Graft.nearDupPairsByScript]] routes on a lang
    * column; this computes the route when no such column exists —
    * the real-corpus case). Pure regexp_replace length arithmetic,
    * identical rules in the oracle; deterministic tie-break latin >
    * cjk > cyrillic.
    */
  val t14 = Q("t14_script_detect",
    (s, dir) => {
      val txt = col("text")
      val total = length(txt).cast("double")
      def share(pattern: String) =
        (length(txt) - length(regexp_replace(txt, pattern, ""))).cast("double") / total
      val latin = share("[A-Za-z\\u00C0-\\u024F]")
      val cjk = share("[\\u4E00-\\u9FFF\\u3040-\\u30FF]")
      val cyr = share("[\\u0400-\\u04FF]")
      load(s, dir, "documents")
        .filter(total > 0)
        .select(col("doc_id"), col("lang"),
          round(latin, 6).as("latin_share"),
          round(cjk, 6).as("cjk_share"),
          round(cyr, 6).as("cyrillic_share"),
          when(latin >= cjk && latin >= cyr, "latin")
            .when(cjk >= cyr, "cjk").otherwise("cyrillic").as("script"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang,
        ROUND(latin, 6) AS latin_share,
        ROUND(cjk, 6) AS cjk_share,
        ROUND(cyr, 6) AS cyrillic_share,
        CASE WHEN latin >= cjk AND latin >= cyr THEN 'latin'
             WHEN cjk >= cyr THEN 'cjk'
             ELSE 'cyrillic' END AS script
      FROM (
        SELECT doc_id, lang,
          CAST(length(text) - length(regexp_replace(text, '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS DOUBLE) / length(text) AS latin,
          CAST(length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS DOUBLE) / length(text) AS cjk,
          CAST(length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS DOUBLE) / length(text) AS cyr
        FROM documents WHERE length(text) > 0) t
      ORDER BY doc_id"""))

  /** Context-window chunking — the INVERSE of t05's packing: long
    * documents split into fixed-size overlapping token windows
    * (64-token chunks, stride 48 → 16-token overlap), each chunk
    * carrying its id, its token count and its re-joined text. The
    * explode is the fan-out a chunking pipeline runs before embedding
    * or training-example emission; chunk boundaries are pure arithmetic
    * on the whitespace token array, so both engines agree exactly.
    * Every token lands in ≥1 chunk; consecutive chunks share exactly
    * the overlap (no trailing chunk fully contained in its
    * predecessor, by the upper-bound formula).
    */
  val t15 = Q("t15_doc_chunking",
    (s, dir) => {
      val size = 64
      val stride = 48
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          split(trim(col("text")), "\\s+").as("toks"))
        .withColumn("nt", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
        .withColumn("start", explode(sequence(lit(1L),
          greatest(lit(1L), col("nt") - lit((size - stride).toLong)),
          lit(stride.toLong))))
        .select(col("doc_id"), col("lang"),
          floor((col("start") - 1) / lit(stride.toDouble)).cast("long").as("chunk_id"),
          col("nt"),
          least(lit(size.toLong), col("nt") - col("start") + 1).as("chunk_tokens"),
          array_join(slice(col("toks"), col("start").cast("int"), lit(size)), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      n AS (
        SELECT doc_id, lang, toks, CAST(len(toks) AS BIGINT) AS nt FROM t),
      s AS (
        SELECT doc_id, lang, toks, nt,
          unnest(generate_series(1, greatest(1, nt - 16), 48)) AS start
        FROM n)
      SELECT doc_id, lang,
        CAST(FLOOR((start - 1) / 48.0) AS BIGINT) AS chunk_id, nt,
        CAST(least(64, nt - start + 1) AS BIGINT) AS chunk_tokens,
        array_to_string(list_slice(toks, start, least(start + 63, nt)), ' ') AS chunk_text
      FROM s ORDER BY doc_id, chunk_id"""))

  /** Dataset MIXTURE resampling: given target domain weights (en 40%,
    * others 15%), derive each domain's keep rate from its CURRENT
    * share — rate = min(1, target_share × N / count_g) — and sample
    * deterministically with t07's Knuth-hash threshold. This is the
    * data-mixture op a pretraining pipeline runs to hit a target
    * composition: over-represented domains are downsampled toward
    * their target, under-represented ones keep everything (a rate
    * can't exceed 1 — mixture reweighting beyond that is repetition,
    * a separate decision). Stats are a tiny per-domain aggregate
    * broadcast back over the corpus — no global window, so the plan
    * holds at any corpus size; rate arithmetic is IEEE-identical in
    * both engines (exact-integer products under 2^53, one floor).
    */
  val t16 = Q("t16_domain_mixture",
    (s, dir) => {
      val weights = typedlit(Map("en" -> 40L, "de" -> 15L, "es" -> 15L,
        "fr" -> 15L, "zh" -> 15L))
      val docs = load(s, dir, "documents")
      val stats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("c_g"))
      val total = docs.agg(count(lit(1)).as("n"))
      val rates = stats.crossJoin(broadcast(total))
        .select(col("lang"),
          least(lit(10000L), floor(lit(100.0) * element_at(weights, col("lang"))
            * col("n") / col("c_g"))).cast("long").as("rate_bp"))
      docs.join(broadcast(rates), Seq("lang"))
        .filter(pmod(col("doc_id") * lit(2654435761L), lit(10000L)) < col("rate_bp"))
        .select(col("doc_id"), col("lang"), col("rate_bp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH stats AS (
        SELECT lang, COUNT(*) AS c_g FROM documents GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n FROM documents),
      rates AS (
        SELECT s.lang,
          CAST(LEAST(10000, FLOOR(100.0 *
            (CASE s.lang WHEN 'en' THEN 40 WHEN 'de' THEN 15 WHEN 'es' THEN 15
                         WHEN 'fr' THEN 15 WHEN 'zh' THEN 15 END)
            * t.n / s.c_g)) AS BIGINT) AS rate_bp
        FROM stats s, tot t)
      SELECT d.doc_id, d.lang, r.rate_bp
      FROM documents d JOIN rates r USING (lang)
      WHERE (d.doc_id * 2654435761) % 10000 < r.rate_bp
      ORDER BY d.doc_id"""))

  /** BM25 relevance scoring (Robertson & Spärck Jones probabilistic
    * IDF, k1 = 1.2, b = 0.75) of every document against a fixed query
    * term set — the retrieval-quality primitive a training pipeline
    * uses for targeted corpus selection (e.g. DSIR-style domain
    * matching). Plan shape: one explode→count for per-(doc, term) tf
    * (map-side combinable, filtered to the query terms BEFORE the
    * shuffle, so the exchange carries |terms|·n_docs rows max), a tiny
    * broadcast df/N/avgdl side, and a final per-doc sum. Per-term
    * contributions are rounded to 6 dp and summed as DECIMAL(18,6) —
    * associative, so shuffle order can't perturb the hash; the `ln`
    * inputs are bit-identical rationals in both engines and the result
    * is rounded well away from representation noise.
    */
  val t17 = Q("t17_bm25_score",
    (s, dir) => {
      val terms = Seq("spark", "table", "hash")
      val docs = load(s, dir, "documents")
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
        .withColumn("dl", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      val scalars = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
        .filter(col("token").isInCollection(terms))
        .groupBy(col("doc_id"), col("dl"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfs = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfs), Seq("token"))
        .crossJoin(broadcast(scalars))
        .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("sat", (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .withColumn("contrib", round(col("idf") * col("sat"), 6)
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("contrib")).cast("double").as("bm25"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents),
      dl AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
      sc AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
      tf AS (
        SELECT doc_id, dl, token, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dl) x
        WHERE token IN ('spark', 'table', 'hash')
        GROUP BY 1, 2, 3),
      dfs AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1)
      SELECT doc_id, COUNT(*) AS n_terms,
        CAST(SUM(CAST(ROUND(
          LN(1.0 + (sc.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
          ((tf.tf * 2.2) /
           (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / (CAST(sc.sum_dl AS DOUBLE) / sc.n_docs)))),
          6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM tf JOIN dfs USING (token), sc
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Deterministic per-group sampling (the scalable substitute for
    * rand(): bottom-k by a cryptographic hash of the id — a consistent
    * sample that is reproducible across reruns, engines, and data
    * re-orderings, and composable across batches because membership
    * depends only on the key). Per-source rank over md5(doc_id), keep
    * the 25 smallest; the shuffle key is the group column, per-group
    * state is a streaming rank — the same plan at any corpus size
    * (skewed/low-cardinality group sets would use the a07-style
    * partial-top-k tree instead of one window partition per group).
    */
  val t18 = Q("t18_deterministic_sample",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
      load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("rk"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 25)
        .select(col("source"), col("rank"), col("doc_id"), col("rk"))
        .orderBy(col("source"), col("rank"))
    },
    Some("""
      SELECT source,
        CAST(ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rank,
        doc_id, md5(CAST(doc_id AS VARCHAR)) AS rk
      FROM documents
      QUALIFY rank <= 25
      ORDER BY source, rank"""))

  /** Feature hashing (the hashing trick, Weinberger et al. ICML'09):
    * fixed 64-bucket token histogram per document, bucket =
    * md5(token)[0:8] as an integer mod 64 — md5 is bit-identical in
    * every engine, so the featurization is portable by construction
    * (xxhash64 would be faster but engine-private). Output in sparse
    * long form (only occupied buckets), which is also what a trainer
    * ingests. One explode + one map-side-combinable count — the
    * featurization plan IS the word-count plan, at any corpus size.
    */
  val t19 = Q("t19_feature_hashing",
    (s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .withColumn("bucket",
          pmod(conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
            lit(64L)))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("bucket"))
    },
    Some("""
      SELECT doc_id,
        CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS bucket,
        COUNT(*) AS n
      FROM (SELECT doc_id,
              unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
            FROM documents) x
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Compression-ratio quality gate ([[graft.functions.GzipRatio]] —
    * the Gopher/CCNet signal: template spam deflates far below natural
    * prose). Every 11th document gets a planted degenerate twin (its
    * first token repeated 200×) at doc_id+20000; the gate must flag
    * every planted twin and no original (the corpus's random-vocab
    * prose sits well above the 0.35 threshold — asserted in-row, q52
    * stance, since no SQL engine exposes deflate). Pure per-row
    * codegen expression: scan → project, zero shuffle at any scale.
    * Planted ids start at max(doc_id)+1 — derived, not a constant, so
    * a larger corpus can never collide real ids into the planted range
    * — and `is_planted` is CARRIED through the union rather than
    * re-derived from the id.
    */
  val t20 = Q("t20_compression_gate",
    (s, dir) => {
      val docs = load(s, dir, "documents").select(col("doc_id"), col("text"))
      // in-plan 1-row broadcast offset (null-safe on an empty corpus,
      // no eager driver action) — same stance as d15's planted range
      val off = broadcast(docs.agg(
        (coalesce(max(col("doc_id")), lit(-1L)) + lit(1L)).as("_off")))
      val planted = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
        .crossJoin(off)
        .select((col("doc_id") + col("_off")).as("doc_id"),
          array_join(array_repeat(element_at(split(trim(col("text")), "\\s+"), 1),
            200), " ").as("text"),
          lit(true).as("is_planted"))
      docs.withColumn("is_planted", lit(false)).unionByName(planted)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.gzipRatio(col("text")), 4)
            .as("gzip_ratio"),
          col("is_planted"))
        .withColumn("flagged", col("gzip_ratio") < 0.35)
        .withColumn("gate_correct", col("flagged") === col("is_planted"))
        .orderBy(col("doc_id"))
    },
    None)

  /** Unigram-LM surprisal scoring (the CCNet perplexity filter with
    * the corpus itself as the LM): token probability = corpus MLE
    * freq/total, each occurrence contributes −ln p, and a document's
    * score is the mean surprisal in nats (ppl = e^mean beside it).
    * Every corpus token has freq ≥ 1, so p > 0 and ln is total. Plan:
    * one token count (map-side combinable) joined back to the token
    * stream on the token key, then a per-doc decimal sum of 6-dp
    * contributions — t17's arithmetic discipline, t11's join shape.
    * At web scale the LM side is top-V vocab + an OOV floor instead
    * of the full table; the plan is otherwise unchanged.
    */
  val t21 = Q("t21_lm_surprisal",
    (s, dir) => {
      val toks = load(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      val freqs = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      val total = toks.agg(count(lit(1)).as("_total"))
      // the doc mean rides in exact integer MICRO-units end to end:
      // per-token surprisal is 6-dp decimal (×1e6 = an exact long),
      // and mean = round-half-up((2·Σ + n) div 2n) in integer
      // arithmetic — round(double÷count, 6) instead lands on a .5
      // boundary somewhere in a 50k-doc corpus and the two engines'
      // double-rounding disagrees by the last printed digit
      toks.join(freqs, Seq("token"))
        .crossJoin(broadcast(total))
        .withColumn("surprisal",
          round(-log(col("freq").cast("double") / col("_total")), 6)
            .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum((col("surprisal") * lit(1000000)).cast("long")).as("s_u"))
        .withColumn("mean_surprisal",
          expr("(2 * s_u + n_tokens) div (2 * n_tokens)").cast("double")
            / lit(1000000.0))
        .withColumn("ppl", round(exp(col("mean_surprisal")), 4))
        .select(col("doc_id"), col("n_tokens"), col("mean_surprisal"), col("ppl"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents),
      freqs AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY 1),
      tot AS (SELECT COUNT(*) AS total FROM toks),
      per_doc AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
          SUM(CAST(CAST(ROUND(-LN(CAST(freq AS DOUBLE) / tot.total), 6)
            AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS s_u
        FROM toks JOIN freqs USING (token), tot
        GROUP BY doc_id, tot.total)
      SELECT doc_id, n_tokens,
        CAST((2 * s_u + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1000000.0
          AS mean_surprisal,
        ROUND(EXP(CAST((2 * s_u + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1000000.0), 4) AS ppl
      FROM per_doc ORDER BY doc_id"""))

  /** Epoch upsampling — t16's other half (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": under-represented
    * domains repeat for up to ~4 epochs before returns collapse).
    * Per-domain repeat factor = ceil(target_tokens / actual_tokens)
    * capped at 4, derived from a tiny per-domain aggregate; each doc
    * then fans out into (doc_id, epoch) rows via an explode over
    * sequence(1, copies) — deterministic integer arithmetic end to
    * end, so the oracle hash-matches. The fan-out multiplies rows by
    * ≤4 with zero extra shuffle (explode is a generator in the scan
    * stage); the only exchange is the per-domain stats broadcast.
    */
  val t22 = Q("t22_epoch_upsample",
    (s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      val stats = docs.groupBy(col("lang")).agg(sum(col("n_tok")).as("tok_g"))
      // target: every domain should contribute >= 30k tokens (sf0.01
      // puts 'en' far above, the rest below -> factors 1..4 all occur)
      val rates = stats.select(col("lang"),
        least(lit(4L), ceil(lit(30000.0) / col("tok_g")).cast("long"))
          .as("n_epochs"))
      docs.join(broadcast(rates), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_epochs"),
          explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      stats AS (SELECT lang, SUM(n_tok) AS tok_g FROM d GROUP BY 1),
      rates AS (
        SELECT lang,
          LEAST(4, CAST(CEIL(30000.0 / tok_g) AS BIGINT)) AS n_epochs
        FROM stats)
      SELECT doc_id, d.lang, r.n_epochs, CAST(u.epoch AS BIGINT) AS epoch
      FROM d JOIN rates r USING (lang),
        UNNEST(generate_series(1, r.n_epochs)) AS u(epoch)
      ORDER BY doc_id, epoch"""))

  def qs: Seq[Q] = Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10,
    t11, t12, t13, t14, t15, t16, t17, t18, t19, t20, t21, t22)
}
