package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.T._

/** Training-batch assembly + data-selection operators for the
  * LLM-data pipeline: sequence packing (the exact-interval
  * concat-and-chunk form and the greedy no-split form — [[TextAnalysis.t05]]
  * is the doc-granularity cousin) and DSIR importance resampling.
  * Same oracle discipline as [[TextAnalysis]]: every float aggregate
  * goes through 6-dp-rounded DECIMAL sums, every computed column is
  * aliased identically in both engines.
  */
object TextAnalysis2 {

  /** Tokens per training sequence for the packing operators. */
  private val SeqBudget = 512L

  /** Concat-and-chunk sequence packing (the GPT-2/Pile batch-assembly
    * shape: documents are concatenated in a fixed deterministic order
    * and the token stream is cut every `SeqBudget` tokens — documents
    * MAY span a sequence boundary). Each doc maps to the half-open
    * token interval [start_tok, end_tok) of the virtual stream, from
    * which its first/last sequence ids and offset are pure integer
    * arithmetic. ([[TextAnalysis.t05]] buckets doc STARTS per-lang at
    * doc granularity; this is the exact-slicing form — boundary-
    * crossing spans, offsets — a packer actually materializes.)
    *
    * The global prefix sum is computed as a TWO-LEVEL scan so no
    * window ever sees the whole corpus in one partition: docs fold
    * into `doc_id div 1024` blocks (per-block sums, parallel), block
    * totals take a tiny cumulative window (corpus/1024 rows — the one
    * sequential step, itself recursable into L levels at extreme
    * scale), and the broadcast block bases re-anchor a per-block
    * window that runs in parallel across blocks. Shuffle cost: one
    * block aggregate + one 1024-rows-per-partition window — no
    * single-partition pass over the data, at any corpus size.
    */
  val t23 = Q("t23_sequence_packing",
    (s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
          expr("doc_id div 1024").as("block"))
      val blocks = docs.groupBy(col("block")).agg(sum(col("n_tok")).as("tok_b"))
      // the one sequential step runs over the corpus/1024-row block
      // frame; the single partition is DECLARED via a materialized
      // constant key (an empty partition spec means the same physical
      // plan but a WindowExec warning on every run — the partition
      // column makes the deliberate choice explicit to the engine)
      val wBlocks = Window.partitionBy(col("_all")).orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = blocks.withColumn("_all", lit(0))
        .withColumn("base", coalesce(sum(col("tok_b")).over(wBlocks), lit(0L)))
        .select(col("block"), col("base"))
      val wInBlock = Window.partitionBy(col("block")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(bases), Seq("block"))
        .withColumn("end_tok", col("base") + sum(col("n_tok")).over(wInBlock))
        .withColumn("start_tok", col("end_tok") - col("n_tok"))
        .withColumn("seq_first", expr(s"start_tok div $SeqBudget"))
        .withColumn("seq_last", expr(s"(end_tok - 1) div $SeqBudget"))
        .withColumn("seq_offset", pmod(col("start_tok"), lit(SeqBudget)))
        .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
        .select(col("doc_id"), col("n_tok"), col("start_tok"), col("seq_first"),
          col("seq_last"), col("seq_offset"), col("n_seqs"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, n_tok,
          CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS end_tok
        FROM d)
      SELECT doc_id, n_tok,
        end_tok - n_tok AS start_tok,
        (end_tok - n_tok) // 512 AS seq_first,
        (end_tok - 1) // 512 AS seq_last,
        (end_tok - n_tok) % 512 AS seq_offset,
        ((end_tok - 1) // 512) - ((end_tok - n_tok) // 512) + 1 AS n_seqs
      FROM c ORDER BY doc_id"""))

  /** Greedy no-split bin packing (the T5/FlanT5 batch-assembly shape:
    * a document never crosses a sequence boundary; a new bin starts
    * whenever the next doc would overflow the budget; an over-budget
    * doc takes a bin alone). The fold is sequentially dependent, so
    * it runs as genuine per-partition imperative logic — the ONE
    * family where mapPartitions is the honest tool: each source shard
    * packs independently (exactly how production packers parallelize,
    * one packer per input shard), `repartition(source)` +
    * `sortWithinPartitions` gives each partition its shards' docs in
    * order, and the fold streams with O(1) state — no group
    * materialization, no driver collect. The DuckDB oracle states the
    * same fold as a recursive CTE.
    */
  val t24 = Q("t24_greedy_packing",
    (s, dir) => {
      import s.implicits._
      val b = 256L
      load(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
        .repartition(col("source"))
        .sortWithinPartitions(col("source"), col("doc_id"))
        .as[(String, Long, Long)]
        .mapPartitions { it =>
          var cur: String = null
          var bin = 0L
          var fill = 0L
          it.map { case (src, id, n) =>
            if (src != cur) { cur = src; bin = 0L; fill = 0L }
            if (fill > 0 && fill + n > b) { bin += 1; fill = 0L }
            fill += n
            (src, id, n, bin, fill)
          }
        }
        .toDF("source", "doc_id", "n_tok", "bin", "fill_after")
        .orderBy(col("source"), col("doc_id"))
    },
    Some("""
      WITH RECURSIVE d AS (
        SELECT source, doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      p AS (
        SELECT source, doc_id, n_tok, rn,
          CAST(0 AS BIGINT) AS bin, n_tok AS fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.n_tok, d.rn,
          CASE WHEN p.fill + d.n_tok > 256 THEN p.bin + 1 ELSE p.bin END,
          CASE WHEN p.fill + d.n_tok > 256 THEN d.n_tok ELSE p.fill + d.n_tok END
        FROM p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
      SELECT source, doc_id, n_tok, bin, fill AS fill_after
      FROM p ORDER BY source, doc_id"""))

  /** DSIR importance resampling (Xie et al., NeurIPS 2023: "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by the log-likelihood ratio of a target-domain
    * unigram LM vs the raw-pool LM over HASHED n-gram features, then
    * keep the top-k. Target domain here = the `lang = 'en'` slice;
    * features = t19's 64 md5 buckets (engine-portable by
    * construction); both LMs are add-one smoothed so every λ is a
    * total function. Per-bucket λ is rounded to 6 dp and summed as
    * DECIMAL over token occurrences — associative, so shuffle order
    * cannot perturb the hash (t17/t21 discipline). Plan: one
    * map-side-combinable bucket count each for pool and target, a
    * ≤64-row broadcast λ table, one per-doc sum, and a top-k via
    * orderBy+limit (TakeOrderedAndProject: per-partition heaps) with
    * only the 100 survivors entering the ranking window (t10's
    * shape) — at web scale the λ table stays 64 rows and the only
    * data-sized exchanges are the two word-count shapes.
    */
  val t25 = Q("t25_dsir_resample",
    (s, dir) => {
      // fanOut: four passes (totals/pool/target/weights) each tokenize +
      // md5-bucket every token, off one unsplittable scan task otherwise
      val toks = graft.ops.fanOut(load(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .withColumn("bucket",
          pmod(conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
            lit(64L)))
      val totals = toks.agg(count(lit(1)).as("tr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
      val pool = toks.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
      val target = toks.filter(col("lang") === "en")
        .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
      val lam = pool.join(target, Seq("bucket"), "left")
        .crossJoin(broadcast(totals))
        .select(col("bucket"),
          round(log(((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("tt") + lit(64.0)))
            / ((col("cr") + lit(1.0)) / (col("tr") + lit(64.0)))), 6)
            .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6))
            .as("lam"))
      val weights = toks.join(broadcast(lam), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          round(sum(col("lam")).cast("double"), 6).as("dsir_w"))
      val top = weights.orderBy(col("dsir_w").desc, col("doc_id")).limit(100)
      val wTop = Window.partitionBy(col("_all"))
        .orderBy(col("dsir_w").desc, col("doc_id"))
      top.withColumn("_all", lit(0)).withColumn("rank", row_number().over(wTop))
        .select(col("doc_id"), col("n_tok"), col("dsir_w"), col("rank"))
        .orderBy(col("rank"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents),
      b AS (
        SELECT doc_id, lang,
          CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS bucket
        FROM toks),
      tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS tr,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
        FROM b),
      pool AS (SELECT bucket, COUNT(*) AS cr FROM b GROUP BY 1),
      target AS (SELECT bucket, COUNT(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
      lam AS (
        SELECT pool.bucket,
          CAST(ROUND(LN(((COALESCE(target.ct, 0) + 1.0) / (tot.tt + 64.0))
            / ((pool.cr + 1.0) / (tot.tr + 64.0))), 6) AS DECIMAL(18,6)) AS lam
        FROM pool LEFT JOIN target USING (bucket), tot),
      w AS (
        SELECT b.doc_id, COUNT(*) AS n_tok,
          ROUND(CAST(SUM(lam.lam) AS DOUBLE), 6) AS dsir_w
        FROM b JOIN lam USING (bucket)
        GROUP BY 1)
      SELECT doc_id, n_tok, dsir_w,
        CAST(ROW_NUMBER() OVER (ORDER BY dsir_w DESC, doc_id) AS INT) AS rank
      FROM w QUALIFY rank <= 100 ORDER BY rank"""))

  /** Adjacent token-pair (bigram) frequency count — the statistic BPE
    * merge selection is built on (Sennrich et al. 2016: each merge
    * round promotes the most frequent adjacent symbol pair; reference
    * tokenization shape `transform/text.py`'s whitespace pipeline) and
    * equally the bigram-LM numerator. Pairs are formed INSIDE the row
    * by zipping the token array against its own tail — no self-join,
    * no window, no positional explode-then-rejoin: the plan is
    * scan → explode → partial+final count → TakeOrdered(20), every
    * stage map-side combinable. At 100 TB the only data-sized exchange
    * is the pair-count aggregate, whose key space is the vocabulary
    * squared *observed* (Heaps-law bounded), not the corpus.
    */
  val t26 = Q("t26_bpe_pair_counts",
    (s, dir) => {
      load(s, dir, "documents")
        .select(split(lower(trim(col("text"))), "\\s+").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    },
    Some("""
      WITH d AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents),
      p AS (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i + 1])) AS pair
        FROM d WHERE len(t) >= 2)
      SELECT pair, COUNT(*) AS cnt FROM p
      GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20"""))

  /** Per-document bigram-LM surprisal with add-one smoothing — t21's
    * CCNet-style perplexity filter upgraded from unigram to 2-gram
    * context, the corpus as its own LM: P(cur|prev) =
    * (c(prev,cur)+1) / (c(prev,·)+V). Pairs come from t26's in-row
    * tail-zip (one generator, no positional self-join); the count
    * tables are OBSERVED-vocab-bounded (Heaps law), so the two count
    * joins key on vocabulary, not corpus; per-bigram NLL is
    * 6-dp-rounded and decimal-summed per doc (engine-order-free); the
    * final top-100-most-surprising is TakeOrdered, never a global
    * sort. The highest-NLL tail is exactly the gibberish/boilerplate
    * slice a perplexity gate drops.
    */
  val t27 = Q("t27_bigram_surprisal",
    (s, dir) => {
      // fanOut: vocab + three bigram passes tokenize per row off one
      // unsplittable scan task otherwise
      val docs = graft.ops.fanOut(load(s, dir, "documents"))
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      val vocab = docs
        .select(explode(col("t")).as("token"))
        .agg(countDistinct(col("token")).as("_v"))
      val bge = docs.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
        .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      val biCnt = bge.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_bi"))
      val ctxCnt = bge.groupBy(col("prev")).agg(count(lit(1)).as("c_ctx"))
      bge.join(biCnt, Seq("prev", "cur"))
        .join(ctxCnt, Seq("prev"))
        .crossJoin(broadcast(vocab))
        .withColumn("nll",
          round(-log((col("c_bi") + lit(1.0)) / (col("c_ctx") + col("_v"))), 6)
            .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("mean_nll"))
        .withColumn("ppl", round(exp(col("mean_nll")), 4))
        .orderBy(col("mean_nll").desc, col("doc_id"))
        .limit(100)
    },
    Some("""
      WITH d AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents),
      v AS (
        SELECT COUNT(DISTINCT token) AS vs
        FROM (SELECT unnest(t) AS token FROM d)),
      bge AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS prev,
          unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i + 1])) AS cur
        FROM d WHERE len(t) >= 2),
      bc AS (SELECT prev, cur, COUNT(*) AS c_bi FROM bge GROUP BY 1, 2),
      cc AS (SELECT prev, COUNT(*) AS c_ctx FROM bge GROUP BY 1),
      nll AS (
        SELECT doc_id,
          CAST(ROUND(-LN((c_bi + 1.0) / (c_ctx + v.vs)), 6) AS DECIMAL(18,6)) AS nll
        FROM bge JOIN bc USING (prev, cur) JOIN cc USING (prev), v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll,
        ROUND(EXP(ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6)), 4) AS ppl
      FROM nll GROUP BY doc_id
      ORDER BY mean_nll DESC, doc_id LIMIT 100"""))

  /** Fused multi-signal quality gate (the Gopher/RedPajama rule-stack
    * shape: Rae et al. 2021 §A1.1.2): SIX document-quality rules —
    * length bounds, mean token length, stopword floor, digit-density
    * ceiling, duplicate-token dominance — evaluated in ONE projection
    * over one scan. No joins, no shuffle, no UDF: every signal is
    * in-row array/string arithmetic, and every rule COMPARISON is
    * exact integer cross-multiplication (stop·50 < n_tok encodes
    * ratio < 0.02), so the keep/drop decision and the reason BITMASK
    * are float-free and engine-exact. This is the fusion stance of
    * `validate/Semantic` applied to corpus curation: N rules never
    * cost N scans, and at 100 TB the gate is embarrassingly parallel
    * (a single WholeStageCodegen span — see PLANS.md).
    */
  val t28 = Q("t28_quality_gate_fused",
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on",
        "for", "with")
      load(s, dir, "documents")
        .select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("t"),
          length(col("text")).as("n_chars"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", ""))).as("digits"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tok"),
          aggregate(transform(col("t"), x => length(x)), lit(0),
            (acc, x) => acc + x).cast("long").as("tok_chars"),
          size(filter(col("t"), x => x.isInCollection(stop)))
            .cast("long").as("stop_cnt"),
          col("digits").cast("long").as("digit_cnt"),
          col("n_chars").cast("long").as("n_chars"),
          size(array_distinct(col("t"))).cast("long").as("n_distinct"))
        .withColumn("mask",
          (when(col("n_tok") < 5, 1L).otherwise(0L) +
            when(col("n_tok") > 5000, 2L).otherwise(0L) +
            when(col("tok_chars") < lit(2L) * col("n_tok") ||
              col("tok_chars") > lit(12L) * col("n_tok"), 4L).otherwise(0L) +
            when(col("stop_cnt") * 50L < col("n_tok"), 8L).otherwise(0L) +
            when(col("digit_cnt") * 5L > col("n_chars"), 16L).otherwise(0L) +
            when((col("n_tok") - col("n_distinct")) * 2L > col("n_tok"), 32L)
              .otherwise(0L)).as("mask"))
        .withColumn("keep", (col("mask") === 0L).cast("boolean"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
          regexp_split_to_array(lower(trim(text)), '\s+') AS t,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS BIGINT) AS digit_cnt
        FROM documents),
      sig AS (
        SELECT doc_id,
          CAST(len(t) AS BIGINT) AS n_tok,
          CAST(list_reduce(list_prepend(0, list_transform(t, x -> length(x))),
            (a, x) -> a + x) AS BIGINT) AS tok_chars,
          CAST(len(list_filter(t, x -> list_contains(
            ['the','a','of','and','to','in','is','on','for','with'], x)))
            AS BIGINT) AS stop_cnt,
          digit_cnt, n_chars,
          CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
        FROM d)
      SELECT doc_id, n_tok, tok_chars, stop_cnt, digit_cnt, n_chars,
        n_distinct,
        (CASE WHEN n_tok < 5 THEN 1 ELSE 0 END +
         CASE WHEN n_tok > 5000 THEN 2 ELSE 0 END +
         CASE WHEN tok_chars < 2 * n_tok OR tok_chars > 12 * n_tok
              THEN 4 ELSE 0 END +
         CASE WHEN stop_cnt * 50 < n_tok THEN 8 ELSE 0 END +
         CASE WHEN digit_cnt * 5 > n_chars THEN 16 ELSE 0 END +
         CASE WHEN (n_tok - n_distinct) * 2 > n_tok THEN 32 ELSE 0 END)
          AS mask,
        ((CASE WHEN n_tok < 5 THEN 1 ELSE 0 END +
          CASE WHEN n_tok > 5000 THEN 2 ELSE 0 END +
          CASE WHEN tok_chars < 2 * n_tok OR tok_chars > 12 * n_tok
               THEN 4 ELSE 0 END +
          CASE WHEN stop_cnt * 50 < n_tok THEN 8 ELSE 0 END +
          CASE WHEN digit_cnt * 5 > n_chars THEN 16 ELSE 0 END +
          CASE WHEN (n_tok - n_distinct) * 2 > n_tok THEN 32 ELSE 0 END) = 0)
          AS keep
      FROM sig ORDER BY doc_id"""))

  /** Mergeable distinct-counting (Apache DataSketches HLL via Spark's
    * native hll_sketch_agg/hll_union_agg): per-source token sketches
    * built independently — the shape of per-day/per-shard corpus
    * statistics at 100 TB — then UNIONED into the global estimate
    * without touching the data again. Sketch union is exact over
    * sketch state (sketch(A) ∪ sketch(B) ≡ sketch(A ∪ B)), so
    * incremental maintenance gives the SAME estimate as a full rebuild
    * — asserted in SketchMergeSpec; q25/q29 pin the approx-vs-exact
    * twin discipline. Rows-only here by design: the estimate is
    * DataSketches-implementation-specific, which no SQL oracle
    * reproduces (the spec anchors it within 5% of exact distinct).
    */
  val t29 = Q("t29_mergeable_distinct",
    (s, dir) => {
      val toks = load(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      val perSource = toks.groupBy(col("source"))
        .agg(hll_sketch_agg(col("token"), lit(12)).as("sk"))
      val global = perSource
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
        .select(lit("__all__").as("source"),
          hll_sketch_estimate(col("sk")).as("est_distinct"))
      perSource
        .select(col("source"), hll_sketch_estimate(col("sk")).as("est_distinct"))
        .unionByName(global)
        .orderBy(col("source"))
    },
    None)

  /** Mergeable quantile sketch ([[graft.functions.KllQuantiles]] — the
    * rank-statistics sibling of t29's HLL distinct sketch): per-source
    * document-length quantiles via a KLL-style compactor ladder that
    * aggregates with O(k) state and map-side combine, replacing the
    * full per-group sort at 100 TB. Probabilities are binary-exact
    * (0, ¼, ½, ¾, 1) so ⌈p·n⌉ computes identically in double and
    * DECIMAL arithmetic; k=8192 keeps every sf0.01/sf0.1 group in the
    * sketch's EXACT regime, which is what the DuckDB rank-selection
    * oracle checks (the t25-style degenerate-twin discipline — the
    * sketchy regime's error bound is KllQuantilesSpec territory).
    */
  val t30 = Q("t30_kll_quantiles",
    (s, dir) => {
      val probs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
      load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.GraftFunctions
            .kllQuantiles(col("n_chars").cast("double"), 8192, probs).as("qs"))
        .select(col("source"), col("n_docs"),
          element_at(col("qs"), 1).as("q00"),
          element_at(col("qs"), 2).as("q25"),
          element_at(col("qs"), 3).as("q50"),
          element_at(col("qs"), 4).as("q75"),
          element_at(col("qs"), 5).as("q100"))
        .orderBy(col("source"))
    },
    Some("""
      WITH r AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS v,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
          COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents)
      SELECT source, MAX(n) AS n_docs,
        MIN(v) AS q00,
        MIN(CASE WHEN rn >= GREATEST(1, CAST(CEIL(0.25 * n) AS BIGINT))
            THEN v END) AS q25,
        MIN(CASE WHEN rn >= GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
            THEN v END) AS q50,
        MIN(CASE WHEN rn >= GREATEST(1, CAST(CEIL(0.75 * n) AS BIGINT))
            THEN v END) AS q75,
        MAX(v) AS q100
      FROM r GROUP BY source ORDER BY source"""))

  /** BPE ENCODING — applying a rank-ordered merge table (the artifact
    * t26's pair statistics feed the training of) to the corpus. The
    * trick that keeps this inside codegen'd built-ins AND exactly
    * SQL-expressible: a word is bracket-wrapped per symbol
    * (`low → (l)(o)(w)`) so each ranked merge is one literal
    * `replace('(a)(b)' → '(ab)')` — brackets delimit both sides of
    * every candidate pair, so left-to-right non-overlapping replace IS
    * the BPE merge rule (adjacent occurrences chain correctly:
    * `(o)(o)(o)` + merge o,o → `(oo)(o)`), merges never cross the
    * space between words, and token count falls out as the number of
    * surviving `(`. One zero-shuffle projection over the corpus + a
    * per-lang rollup; the merge table is a literal (production: read
    * from the tokenizer artifact and fold the same chain).
    */
  val t31 = Q("t31_bpe_encode",
    (s, dir) => {
      val merges = Seq( // rank-ordered; later merges build on earlier ones
        "e" -> "s", "d" -> "e", "o" -> "s", "a" -> "r",
        "q" -> "u", "es" -> "t", "c" -> "o", "m" -> "a")
      val cleaned = regexp_replace(lower(trim(col("text"))),
        "[^\\p{L}\\p{N} ]", "")
      val wrapped = regexp_replace(cleaned, "(\\S)", "($1)")
      val encoded = merges.foldLeft(wrapped) { case (c, (a, b)) =>
        call_function("replace", c, lit(s"($a)($b)"), lit(s"($a$b)"))
      }
      load(s, dir, "documents")
        .select(col("lang"),
          (length(encoded) - length(call_function("replace", encoded,
            lit("("), lit("")))).as("n_tokens"),
          length(call_function("replace", cleaned, lit(" "), lit("")))
            .as("n_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          round(sum(col("n_tokens")) / sum(col("n_chars")).cast("double"), 6)
            .as("tokens_per_char"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH e AS (
        SELECT lang,
          replace(replace(replace(replace(replace(replace(replace(replace(
            regexp_replace(
              regexp_replace(lower(trim(text)), '[^\p{L}\p{N} ]', '', 'g'),
              '(\S)', '(\1)', 'g'),
            '(e)(s)', '(es)'), '(d)(e)', '(de)'), '(o)(s)', '(os)'),
            '(a)(r)', '(ar)'), '(q)(u)', '(qu)'), '(es)(t)', '(est)'),
            '(c)(o)', '(co)'), '(m)(a)', '(ma)') AS enc,
          replace(regexp_replace(lower(trim(text)), '[^\p{L}\p{N} ]', '', 'g'),
            ' ', '') AS chars
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(length(enc) - length(replace(enc, '(', ''))) AS BIGINT) AS n_tokens,
        CAST(SUM(length(chars)) AS BIGINT) AS n_chars,
        ROUND(SUM(length(enc) - length(replace(enc, '(', '')))
          / CAST(SUM(length(chars)) AS DOUBLE), 6) AS tokens_per_char
      FROM e GROUP BY lang ORDER BY lang"""))

  def qs: Seq[Q] = Seq(t23, t24, t25, t26, t27, t28, t29, t30, t31)
}
