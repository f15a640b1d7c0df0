package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build/probe phase split for the queries that construct a persisted
  * index or versioned table before reading it. The combined query (as
  * registered in [[SparkEntry.queries]]) is the correctness surface;
  * the bench additionally times the two phases separately, because the
  * number a user plans capacity around is the STEADY-STATE probe — at
  * scale the index is built once and probed for months, and folding a
  * quantizer-training + partitioned-write into every probe timing makes
  * the read path look 5× heavier than it is (and scales the bench
  * superlinearly with C).
  *
  * Each entry: invoking the outer function performs the one-time build
  * and returns a thunk that runs the steady-state probe against the
  * built artifact. Both phases reuse the exact code the combined query
  * runs (the `*Build`/`*Probe` pieces the Q definitions compose), so
  * the split cannot drift from the correctness path.
  */
object BenchPhases {

  val phased: Map[String, (SparkSession, String) => () => DataFrame] = Map(
    "a06_ann_ivf_persisted" -> { (s, dir) =>
      val (idx, cents) = queries.VectorSearch.a06Build(s, dir)
      () => queries.VectorSearch.a06Probe(s, dir, idx, cents)
    },
    "a08_ann_ivf_batch" -> { (s, dir) =>
      val (idx, cents) = queries.VectorSearch.a08Build(s, dir)
      () => queries.VectorSearch.a08Probe(s, dir, idx, cents)
    },
    "a10_ann_pq" -> { (s, dir) =>
      val (path, books) = queries.VectorSearch.a10Build(s, dir)
      () => queries.VectorSearch.a10Probe(s, dir, path, books)
    },
    "a11_ann_ivfpq_persisted" -> { (s, dir) =>
      val (idx, cents, books) = queries.VectorSearch.a11Build(s, dir)
      () => queries.VectorSearch.a11Probe(s, dir, idx, cents, books)
    },
    "a18_pq_shortlist_all" -> { (s, dir) =>
      val (path, books) = queries.VectorSearch.a18Build(s, dir)
      () => queries.VectorSearch.a18Probe(s, dir, path, books)
    },
    "a19_ivfpq_probe_all" -> { (s, dir) =>
      val (idx, cents, books) = queries.VectorSearch.a19Build(s, dir)
      () => queries.VectorSearch.a19Probe(s, dir, idx, cents, books)
    },
    "s06_data_skipping" -> { (s, dir) =>
      val root = queries.StoreOps.s06Build(s, dir)
      () => queries.StoreOps.s06Probe(s, dir, root)
    },
    "s08_zorder_skipping" -> { (s, dir) =>
      val path = queries.StoreOps.s08Build(s, dir)
      () => queries.StoreOps.s08Probe(s, dir, path)
    },
    "s09_time_travel" -> { (s, dir) =>
      val root = queries.StoreOps.s09Build(s, dir)
      () => queries.StoreOps.s09Probe(s, dir, root)
    },
    "s13_bloom_point_skipping" -> { (s, dir) =>
      val root = queries.StoreOps.s13Build(s, dir)
      () => queries.StoreOps.s13Probe(s, dir, root)
    },
    "a31_sq8_shortlist_all" -> { (s, dir) =>
      val (path, bounds) = queries.VectorSearch.a31Build(s, dir)
      () => queries.VectorSearch.a31Probe(s, dir, path, bounds, shortlist = 1000000)
    },
    "a32_ivfsq_probe_all" -> { (s, dir) =>
      val (idx, cents, bounds) = queries.VectorSearch.a32Build(s, dir)
      () => queries.VectorSearch.a32Probe(s, dir, idx, cents, bounds,
        nprobe = 8, shortlist = 1000000)
    },
    "a33_ann_filtered" -> { (s, dir) =>
      val (idx, cents) = queries.VectorSearch.a06Build(s, dir)
      () => queries.VectorSearch.a33Probe(s, dir, idx, cents)
    })

  /** Per-query budget overrides (seconds) for queries that are heavy BY
    * DESIGN — the flag should fire on a regression, not chronically.
    * Every entry documents why the default budget doesn't fit.
    */
  val budgetOverrides: Map[String, Double] = Map(
    "d08_neardup_clusters" -> 6.0, // full pair-graph connected-components closure (multi-round large/small-star)
    "d10_cjk_char_dedup" -> 4.5,   // char-gram shingling is ~5x the token count of word grams
    "d14_containment_join" -> 4.5, // asymmetric probe join counts every shared shingle exactly
    "d15_semantic_dedup" -> 4.0,   // C=1 oracle degeneracy is deliberately all-pairs (25M cosines); production C>1 is cell-confined (spec)
    "d18_containment_bloom" -> 4.5, // d14's work PLUS the bloom-gate build pass — the past-the-broadcast-wall path exercised at a scale where broadcast still fits (BloomSemDedupSpec proves path equality); strictly more work than its twin by design
    "d21_canonical_selection" -> 5.5, // composite by construction: d06's exact Jaccard pair-gen PLUS d08-style CC rounds PLUS the survivor agg — budget ≈ the sum of its parts, and the selection step itself adds only one key-sized max_by shuffle
    "a29_pca_power_iteration" -> 3.5, // 3 power-iteration rounds, each a full gram-matrix pass; one-time model training amortized like the ANN index builds
    "a34_nn_descent" -> 4.5 // 3 descent rounds + the IVF init build, each round a localCheckpointed mini-job — cost is the FIXED per-round overhead, not data volume (measured flat ~3 s from sf0.001 to sf0.1); one-time graph construction, amortized like the index builds
  )
}
