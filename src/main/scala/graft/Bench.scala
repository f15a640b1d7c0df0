package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Failures are reported per-query (`"failed"`) and
  * excluded from the total, so a crash can never masquerade as a timing.
  *
  * Methodology note: min-of-two in one session means a query's second
  * run may reuse intra-query cache entries whose logical plan is
  * identical (Spark's CacheManager dedupes by plan), so combined
  * numbers approximate WARM steady-state — consistent across rounds.
  * The one-time COLD costs are what the `*_build` rows isolate.
  * Queries run in NAME order (the sortBy below) in one shared session —
  * pinned since round 6, so round-over-round deltas compare like with
  * like. Caveat observed in round 7: when a query family FAILS mid-run
  * (the events-loader regression), the thrown analyses and abandoned
  * jobs perturb JVM/GC state for alphabetically-adjacent families (the
  * s-family sits right after q*) — store timings inflated 3-4× with
  * zero store-code changes, and returned below their round-6 numbers
  * the moment the failures were fixed. A bench with a non-empty
  * `failed` list is not comparable round-over-round.
  *
  * Round-10 triage of a direction-consistent family drift (d10/d06/
  * d21/a32 up ×1.3-1.65 r8→r9 with no dedup-code change): re-run solo
  * (fresh JVM each, [[graft.tools.SoloBench]] min-of-3) on BOTH code
  * versions on one machine state, the r9 code was FASTER than the r8
  * code on all four (e.g. d10 3.10→2.66 s, d21 4.42→3.37 s) — the
  * committed-bench drift was cross-SESSION machine state, not code.
  * Same-family rows move together because they share allocation
  * patterns, so they breathe together with the machine. The
  * round-over-round comparison that is code-attributable is therefore
  * solo-vs-solo on one machine state; committed-bench deltas between
  * rounds carry an environment term the budget/flagged gate absorbs
  * but per-row ratios do not.
  *
  * Queries with a one-time construction phase ([[BenchPhases.phased]])
  * additionally report `<name>_build` (index/table construction, timed
  * once) and `<name>_probe` (steady-state read, min of two runs) rows.
  *
  * Each query carries a time budget (default 2.5 s, override with
  * SPARK_GRAFT_BUDGET_SEC; per-query exceptions with documented reasons
  * in [[BenchPhases.budgetOverrides]]): the `"flagged"` list names the
  * queries over budget — for phased queries the budget applies to the
  * PROBE (the steady-state contract), for everything else to the
  * combined run — so a perf regression in one family is caught by the
  * artifact itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budget = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "2.5").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet reader paths so the first timed
    // query doesn't absorb session startup cost.
    try spark.range(1000000L).selectExpr("sum(id)").collect()
    catch { case _: Throwable => () }
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try graft.queries.T.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    def timed(fn: () => Unit): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] failed: ${e.getMessage}"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // name -> (seconds, ok, countsTowardTotal, budgetChecked)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Boolean, Boolean, Boolean)]
    // two timed runs per query, min reported — damps one-off GC/IO noise
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val (t1, ok1) = timed(() => fn(spark, sfDir).count())
      val combined =
        if (!ok1) (t1, false)
        else { val (t2, ok2) = timed(() => fn(spark, sfDir).count()); (math.min(t1, t2), ok2) }
      val phased = BenchPhases.phased.get(name)
      rows += ((name, combined._1, combined._2, true, phased.isEmpty))
      phased.foreach { mk =>
        var probe: () => org.apache.spark.sql.DataFrame = null
        val (bt, bok) = timed(() => probe = mk(spark, sfDir))
        rows += ((s"${name}_build", bt, bok, false, false))
        if (bok) {
          val (p1, pok1) = timed(() => probe().count())
          val pr = if (!pok1) (p1, false)
            else { val (p2, pok2) = timed(() => probe().count()); (math.min(p1, p2), pok2) }
          rows += ((s"${name}_probe", pr._1, pr._2, false, true))
        }
      }
    }
    val good = rows.filter(_._3)
    val qs = good.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = rows.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = good.filter(_._4).map(_._2).sum
    val flagged = good.filter { r =>
      r._5 && r._2 > BenchPhases.budgetOverrides.getOrElse(r._1, budget)
    }.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // Complete per-query record → repo file (the stdout line must stay
    // short enough for a log tail to capture whole; round-over-round
    // comparison reads this file, not the stdout summary).
    val fullPath = new java.io.File("bench_full.json").getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"flagged":$flagged,"budget_sec":$budget,"sf":"$sfDir","n_queries":${good.size}}""" + "\n")
    // The stdout line carries the FULL per-query map again (round 14):
    // the driver's round-over-round comparator reads stdout, not the
    // repo file, and it extracted nothing two rounds running while the
    // line held only a flagship subset (VERDICT r13 item 2). ~230
    // entries ≈ 10 KB — comfortably inside a log tail, and a strict
    // SUPERSET of the old flagship-subset map (entries only added,
    // none removed or renamed; schema and key order unchanged).
    // build.sbt's run/outputStrategy change strips the "[info] " prefix
    // sbt's logger was wrapping the line in — the likeliest reason the
    // driver's JSON parse failed despite a well-formed payload.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"flagged":$flagged,"budget_sec":$budget,"sf":"$sfDir","n_queries":${good.size},"full":"$fullPath"}""")
    spark.stop()
  }
}
