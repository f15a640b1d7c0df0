package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{BenchPhases, SparkEntry}
import graft.ops.{VectorSearch => V}
import graft.queries.T

/** Scale-trend evidence: run every registered query — plus the
  * build/probe phase splits of the index-building queries, the same
  * 228-entry surface `Bench` times — at each scale factor in ONE JVM
  * (shared warm codegen/reader paths, so the per-SF deltas are
  * data-volume, not startup) and write `SCALE.md` with the per-query
  * growth ratio across the LARGEST step. A query whose time grows
  * faster than its STATED complexity is flagged — that is the operator
  * that breaks first at 100 TB.
  *
  * Stated complexity: most rows must be at-most-linear on a ×step data
  * step. A small, explicit set of rows is quadratic BY DESIGN — the
  * exactness-certification twins (single LSH bucket, C = 1 clustering,
  * query set ∝ corpus) whose entire point is to reproduce a brute-force
  * oracle answer; each is bounded by ×step² and lists the production
  * row that carries the family's scale claim. The `_prod` rows run
  * those production configurations (IVF cells C ∝ √N — the faiss
  * sizing rule) and are bounded by their stated Θ(N^1.5).
  *
  * Directories come from `SPARK_GRAFT_SFS` (comma-separated, smallest
  * first; default the three driver testdata dirs). The sf1.0 dir is
  * synthesized by [[ScaleUp]] (×10 of sf0.1, workload shape preserved),
  * turning the 100× plan audit from extrapolation into a measured
  * two-point ratio. With `SPARK_GRAFT_SCALE_X100=<baseDir>,<bigDir>`
  * set, a second section times [[x100Subset]] on a factor-100
  * substrate and holds each row to linear on the single ×100 hop.
  */
object ScaleBench {
  private val DefaultSfs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Rows that are super-linear BY STATED DESIGN, with their bound as a
    * multiple of the step exponent (1.0 = linear, 1.5 = Θ(N^1.5),
    * 2.0 = Θ(N²)) and the production row that carries the family's
    * linear-scale claim. Every row NOT listed here is held to the
    * linear bound.
    */
  private val statedBounds: Map[String, (Double, String)] = Map(
    "a05_cosine_pairs_exact" ->
      (2.0, "Θ(N²) exactness certificate — no exact blocking prunes " +
        "isotropic high-dim data (op scale notes); production: a03, d15_prod"),
    "a07_ann_batch_exact" ->
      (2.0, "Θ(|Q|·N) with |Q| ∝ N — exact ground truth for a12/a20 " +
        "recall; production: a08 (IVF batch)"),
    "a24_neardup_full_coverage" ->
      (2.0, "Θ(N²) single-bucket certificate of a03's verify machinery; " +
        "production: a03 (banded LSH)"),
    "a30_knn_graph" ->
      (2.0, "Θ(N²) C = 1 exactness configuration (the DuckDB oracle); " +
        "production: a30_knn_graph_prod"),
    "d15_semantic_dedup" ->
      (2.0, "Θ(N²) C = 1 oracle configuration; " +
        "production: d15_semantic_dedup_prod"),
    "a30_knn_graph_prod" ->
      (1.5, "Θ(N^1.5) stated: all-nodes kNN graph at IVF C = ⌈4√N⌉ " +
        "(assignment N·C, probe fan-in N·nprobe·N/C)"),
    "d15_semantic_dedup_prod" ->
      (1.5, "Θ(N^1.5) stated: SemDeDup at C = ⌈4√N⌉ " +
        "(in-cell pairs Σ|cell|² = N²/C)"))

  /** Annotations for ×100 rows whose ratio needs reading guidance but
    * whose bound class is unchanged — rendered after the verdict so a
    * near-bound number is not mistaken for headroom exhaustion.
    */
  private val x100Notes: Map[String, String] = Map(
    "a17_ivf_batch_probe_all" ->
      ("|Q| ∝ N probe-all certificate — the hop is quadratic-flavored " +
        "by construction, so near-bound is its design point, not " +
        "headroom exhaustion; production: a08 (IVF batch, pruned probes)"))

  /** Production-configuration scale rows (timed rows only — the
    * correctness of these code paths is spec territory): the same
    * operators whose oracle twins are quadratic by design, run the way
    * a 100 TB corpus would run them. C = ⌈4√N⌉ keeps every phase at
    * Θ(N^1.5) — the classic IVF sizing — and puts BOTH measured scale
    * points well above [[graft.ops.VectorSearch.LiteralMaxCells]], so
    * these rows exercise the plan-reference kernel regime
    * (CellAssign/CellProbes: constant-size plans, centroids prepared
    * once per executor) that production C requires.
    */
  private[tools] val extras: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a30_knn_graph_prod" -> ((s, dir) => {
      val e = T.load(s, dir, "embeddings")
        .filter(pmod(col("vec_id"), lit(5)) === 0)
      val c = math.max(8, 4 * math.sqrt(e.count().toDouble).ceil.toInt)
      val cents = V.trainCentroids(e, "vec_id", "embedding", c = c, iters = 2)
      V.knnGraph(e, "vec_id", "embedding", cents, k = 5, nprobe = 4)
    }),
    "d15_semantic_dedup_prod" -> ((s, dir) => {
      val e = T.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val c = math.max(8, 4 * math.sqrt(e.count().toDouble).ceil.toInt)
      val cents = V.trainCentroids(e, "vec_id", "embedding", c = c, iters = 2)
      V.semDedup(e, "vec_id", "embedding", cents, tau = 0.99)
    }))

  /** The ×100 section's row set: EVERY registered query — plus the two
    * Θ(N^1.5) production-configuration rows, held to ×100^1.5 — timed
    * on a ×100 substrate when `SPARK_GRAFT_SCALE_X100=<baseDir>,<bigDir>`
    * is set. [[ScaleUp]]'s perturbation is injective past 100 replicas
    * (312 affine letter maps, per-replica Murmur3 sign masks), so the
    * similarity workloads keep their shape on the ×100 hop. The ONLY
    * exclusions — derived from [[statedBounds]], so the list cannot
    * drift — are the Θ(N²) exactness-certification twins: ×10000 on
    * this step is their stated bound, not a regression signal, and
    * hours of wall clock to confirm it. Sub-second rows ride along
    * with ratios far below the bound (launch overhead dominates them);
    * their value is completeness — every linear-bounded operator in the
    * registry is MEASURED on a factor-100 data hop, not extrapolated.
    */
  private def x100Subset: Seq[String] = {
    val quadraticTwins = statedBounds.collect { case (n, (e, _)) if e >= 2.0 => n }.toSet
    (SparkEntry.queries.keys.toSeq ++ extras.keys.toSeq).distinct
      .filterNot(quadraticTwins)
  }

  def main(args: Array[String]): Unit = {
    val sfs = sys.env.get("SPARK_GRAFT_SFS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultSfs)
    require(sfs.size >= 2, "need at least two scale dirs to form a ratio")
    val step = sys.env.getOrElse("SPARK_GRAFT_SCALE_STEP", "10").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try s.range(1000000L).selectExpr("sum(id)").collect()
      catch { case _: Throwable => () }
      s
    }
    var spark = newSession()
    // a fatal task error (e.g. a heap OOM on the largest substrate)
    // stops the local SparkContext; without recovery every LATER row of
    // a ~50-minute artifact run would record FAIL for a reason that has
    // nothing to do with that row. Rebuild the session and keep
    // sweeping — only the row that killed the context stays FAIL.
    def ensureAlive(): Unit = if (spark.sparkContext.isStopped) {
      System.err.println("[scale] SparkContext stopped — rebuilding session")
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      spark = newSession()
    }

    // optional args = subset of query names (quick re-time of one query);
    // SCALE.md is only written on full runs
    val names = (if (args.nonEmpty) args.toSeq
    else SparkEntry.queries.keys.toSeq ++ extras.keys.toSeq).sorted

    def timeOnce(fn: () => Unit, label: String, dir: String): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[scale] $label @ $dir failed: ${e.getMessage}"); None }
    }
    def minOf2(fn: () => Unit, label: String, dir: String): Option[Double] =
      (timeOnce(fn, label, dir), timeOnce(fn, label, dir)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b)             => a.orElse(b)
      }

    // per-SF, per-row min-of-2 seconds (None = failed); row set =
    // combined queries + _build/_probe splits, matching bench_full.json
    val times: Map[String, Map[String, Option[Double]]] = sfs.map { dir =>
      ensureAlive()
      Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
        try graft.queries.T.load(spark, dir, t).count()
        catch { case _: Throwable => () }
      }
      val perQ = scala.collection.mutable.Map.empty[String, Option[Double]]
      names.foreach { name =>
        ensureAlive()
        val run = extras.get(name)
          .getOrElse(SparkEntry.queries(name))
        perQ(name) = minOf2(() => run(spark, dir).count(), name, dir)
        BenchPhases.phased.get(name).foreach { mk =>
          var probe: () => org.apache.spark.sql.DataFrame = null
          val bt = timeOnce(() => probe = mk(spark, dir), s"${name}_build", dir)
          perQ(s"${name}_build") = bt
          if (bt.isDefined)
            perQ(s"${name}_probe") = minOf2(() => probe().count(), s"${name}_probe", dir)
          else perQ(s"${name}_probe") = None
        }
        // several registry queries cache frames they return lazily and
        // so can never unpersist; over a ~45-minute 4-SF sweep those
        // entries accumulate until storage-eviction churn and GC
        // pressure distort the LATE rows (measured: the big N²-verify
        // rows ran ~2x slower deep into a full sweep than solo at
        // identical code). Dropping the cache BETWEEN rows keeps each
        // row's min-of-2 warm behavior while giving every row the same
        // storage baseline. `Bench` deliberately does NOT do this —
        // its methodology is pinned since round 6 for round-over-round
        // comparability and its single-SF sweep is short.
        spark.catalog.clearCache()
      }
      dir -> perQ.toMap
    }.toMap

    val rowNames = times(sfs.head).keys.toSeq.sorted
    val labels = sfs.map(d => Paths.get(d).getFileName.toString)
    val (loDir, hiDir) = (sfs(sfs.size - 2), sfs.last)

    val sb = new StringBuilder
    sb ++= "# SCALE — per-query growth across testdata scale factors\n\n"
    sb ++= "Generated by `graft.tools.ScaleBench` (one JVM, min-of-2 per cell,\n"
    sb ++= s"local[$cpus]; `_build` rows timed once — one-time construction).\n"
    sb ++= s"`ratio` = t(${labels.last}) / t(${labels(labels.size - 2)}) — input rows grow ×${step.toInt} on\n"
    sb ++= s"that step, so `ratio <= ${step.toInt}` is at-most-linear. ${labels.last} is synthesized\n"
    sb ++= "by `graft.tools.ScaleUp`: ×10 key-shifted replicas of sf0.1 with\n"
    sb ++= "per-replica content perturbation that preserves each query's\n"
    sb ++= "workload shape (see its Scaladoc), so this table is a MEASURED\n"
    sb ++= "two-point scale proof, not an extrapolation. Small queries sit far\n"
    sb ++= "below the bound because fixed planning/launch overhead dominates;\n"
    sb ++= "jitter is additive, so a tiny query can't be flagged by noise.\n"
    sb ++= "Multi-second rows carry ~10-20% multiplicative run-to-run\n"
    sb ++= "variation (GC, storage churn), so the flag fires beyond a 25%\n"
    sb ++= "band over the stated bound — a real complexity leak measures\n"
    sb ++= "far outside it (×125 observed for a genuine one), borderline\n"
    sb ++= "band rows measure ×5-×9 when re-run solo.\n\n"
    sb ++= "Most rows are held to the LINEAR bound. The exactness-\n"
    sb ++= "certification twins (brute-force oracle configurations: single\n"
    sb ++= "LSH bucket, C = 1 clustering, query set ∝ corpus) are quadratic\n"
    sb ++= "BY DESIGN and are held to ×step² with their production\n"
    sb ++= "counterpart named in the verdict; the `_prod` rows measure those\n"
    sb ++= "production configurations (IVF C = ⌈4√N⌉, plan-reference kernel\n"
    sb ++= "regime) against their stated Θ(N^1.5).\n\n"
    sb ++= "This file measures the DATA axis at fixed compute; COMPUTE.md\n"
    sb ++= "(`graft.tools.CoreSweep`) measures the COMPUTE axis at fixed data —\n"
    sb ++= "strong scaling (sf10 at 8 vs 32 cores) and weak scaling (data ×10\n"
    sb ++= "with cores ×4) over the heavy tail of the ×100 subset below.\n\n"
    sb ++= s"| query | ${labels.map(_ + " s").mkString(" | ")} | ratio (${labels(labels.size - 2)}->${labels.last}) | verdict |\n"
    sb ++= s"|---|${labels.map(_ => "---").mkString("|")}|---|---|\n"
    var flagged = List.empty[String]
    rowNames.foreach { n =>
      def f(dir: String): String =
        times(dir).get(n).flatten.map(t => f"$t%.3f").getOrElse("FAIL")
      val ratio = for {
        a <- times(loDir).get(n).flatten; b <- times(hiDir).get(n).flatten
      } yield b / a
      // _build/_probe splits inherit their parent row's stated bound
      val parent = n.stripSuffix("_build").stripSuffix("_probe")
      val (exp, note) = statedBounds.getOrElse(parent, (1.0, ""))
      val bound = math.pow(step, exp)
      // multi-second rows carry ~10-20% MULTIPLICATIVE run-to-run
      // variation (GC, storage churn, file-layout parallelism) — solo
      // re-measures of sweep-flagged borderline rows landed ×5-×9
      // where the sweep said ×10-×12 — so the flag fires beyond a 25%
      // band over the stated bound. A real complexity leak is nowhere
      // near the band: the one genuine offender measured ×125 against
      // its ×100 bound with a cache leak, ×21 without it.
      val band = 1.25
      val verdict = ratio match {
        case None => "FAIL"
        case Some(r) if r > bound * band =>
          flagged ::= n; f"EXCEEDS STATED BOUND (×$r%.1f > ×$bound%.0f +25%%)"
        case Some(r) if r > bound =>
          f"ok (×$r%.1f — inside the 25%% measurement band over ×$bound%.0f)"
        case Some(r) if exp > 1.0 => f"within design bound ×$bound%.0f (×$r%.1f) — $note"
        case Some(r) => f"ok (×$r%.2f)"
      }
      sb ++= s"| $n | ${sfs.map(f).mkString(" | ")} | ${ratio.map(r => f"$r%.2f").getOrElse("-")} | $verdict |\n"
    }
    val totals = sfs.map(d => times(d).values.flatten.sum)
    sb ++= s"\n**Totals:** ${labels.zip(totals).map { case (l, t) => f"$l $t%.1f s" }.mkString(" / ")}"
    sb ++= f" -> whole-suite growth ×${totals.last / totals(totals.size - 2)}%.2f on a ×${step.toInt} data step.\n"
    sb ++= (if (flagged.isEmpty) s"\nNo query grows beyond its stated bound on the ×${step.toInt} step.\n"
    else s"\nFlagged beyond stated bound: ${flagged.sorted.mkString(", ")}.\n")

    // ×100 step: time the headline subset on a ×100 substrate against
    // the base point already measured in the main table above (same
    // JVM, same min-of-2/clearCache methodology).
    sys.env.get("SPARK_GRAFT_SCALE_X100").foreach { spec =>
      val parts = spec.split(",").map(_.trim).filter(_.nonEmpty)
      require(parts.length == 2, "SPARK_GRAFT_SCALE_X100=<baseDir>,<bigDir>")
      val (baseDir, bigDir) = (parts(0), parts(1))
      require(times.contains(baseDir),
        s"x100 base $baseDir must be one of SPARK_GRAFT_SFS")
      ensureAlive()
      Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
        try T.load(spark, bigDir, t).count() catch { case _: Throwable => () }
      }
      // args mode (dry runs) restricts the ×100 rows the same way it
      // restricts the main table
      val x100Rows =
        if (args.nonEmpty) x100Subset.filter(args.toSet) else x100Subset
      val big: Map[String, Option[Double]] = x100Rows.map { n =>
        ensureAlive()
        val run = extras.getOrElse(n, SparkEntry.queries(n))
        val t = minOf2(() => run(spark, bigDir).count(), n, bigDir)
        spark.catalog.clearCache()
        n -> t
      }.toMap
      val (baseL, bigL) =
        (Paths.get(baseDir).getFileName.toString, Paths.get(bigDir).getFileName.toString)
      sb ++= s"\n## The ×100 step — the full registry at $bigL\n\n"
      sb ++= s"$bigL is `ScaleUp` at factor 100 from $baseL — one hundred\n"
      sb ++= "key-shifted replicas, dims single-copy, so input volume grows\n"
      sb ++= s"×100 in one hop. `ratio` = t($bigL) / t($baseL); each row is held\n"
      sb ++= "to its stated bound on the hop — ×100 for the linear rows, ×1000\n"
      sb ++= "for the two Θ(N^1.5) production-configuration rows — with the\n"
      sb ++= "same 25% measurement band as above. EVERY registered query is\n"
      sb ++= "measured here — including the banded/blocked similarity paths\n"
      sb ++= "(LSH pairs, PPJoin, near-dup clusters, Hamming join, embedding\n"
      sb ++= "near-dups) and the faiss-sized ANN/SemDeDup production configs:\n"
      sb ++= "ScaleUp's perturbation is injective past 100 replicas (312\n"
      sb ++= "affine letter maps, per-replica Murmur3 sign masks), so those\n"
      sb ++= "workloads keep their pair structure on the hop. The ONLY rows\n"
      sb ++= "excluded are the Θ(N²) exactness-certification twins (×10000 on\n"
      sb ++= "this step is their stated bound, not a signal — and hours of\n"
      sb ++= "wall clock); each has its production counterpart measured here.\n"
      sb ++= "Ratios far below the bound mean fixed planning/launch overhead\n"
      sb ++= "still dominates at the small end.\n\n"
      sb ++= s"| query | $baseL s | $bigL s | ratio ($baseL->$bigL) | verdict |\n"
      sb ++= "|---|---|---|---|---|\n"
      var flagged100 = List.empty[String]
      x100Rows.sorted.foreach { n =>
        val a = times(baseDir).get(n).flatten
        val b = big.get(n).flatten
        val ratio = for { x <- a; y <- b } yield y / x
        // the _prod rows keep their stated N^1.5 bound on the x100 hop
        val (exp, note) = statedBounds.getOrElse(n, (1.0, ""))
        val bound = math.pow(100.0, exp)
        val verdict = ratio match {
          case None => "FAIL"
          case Some(r) if r > bound * 1.25 =>
            flagged100 ::= n; f"EXCEEDS STATED BOUND (×$r%.1f > ×$bound%.0f +25%%)"
          case Some(r) if r > bound =>
            f"ok (×$r%.1f — inside the 25%% measurement band over ×$bound%.0f)"
          case Some(r) if exp > 1.0 =>
            f"within design bound ×$bound%.0f (×$r%.1f) — $note"
          case Some(r) => f"ok (×$r%.1f)"
        }
        val annotated = x100Notes.get(n)
          .map(a => s"$verdict — $a").getOrElse(verdict)
        def fmt(t: Option[Double]): String = t.map(v => f"$v%.3f").getOrElse("FAIL")
        sb ++= s"| $n | ${fmt(a)} | ${fmt(b)} | ${ratio.map(r => f"$r%.1f").getOrElse("-")} | $annotated |\n"
      }
      val (baseTot, bigTot) = (
        x100Rows.flatMap(n => times(baseDir).get(n).flatten).sum,
        big.values.flatten.sum)
      sb ++= f"\n**×100 totals:** $baseL $baseTot%.1f s / $bigL $bigTot%.1f s -> subset growth ×${bigTot / baseTot}%.1f on a ×100 data step.\n"
      sb ++= (if (flagged100.isEmpty) "\nNo registered query grows beyond its stated bound on the ×100 step.\n"
      else s"\nFlagged beyond stated bound on the ×100 step: ${flagged100.sorted.mkString(", ")}.\n")
    }
    if (args.isEmpty) Files.writeString(Paths.get("SCALE.md"), sb.result())
    println(sb.result())
    spark.stop()
  }
}
