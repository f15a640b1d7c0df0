package graft

/** D10 — thin CLI over the library (reference `cli.py:23-419` exposes
  * cepea/conab/ibge/cache/snapshot/health subcommands; here the
  * engine-side equivalents):
  *
  * {{{
  * sbt "runMain graft.Cli verify <sfDir> <outDir>"   # correctness dump
  * sbt "runMain graft.Cli bench"                     # timed run (env-config)
  * sbt "runMain graft.Cli explain [query...]"        # plan audit
  * sbt "runMain graft.Cli scale [query...]"          # scale-trend bench (SCALE.md)
  * sbt "runMain graft.Cli demo"                      # library tour
  * sbt "runMain graft.Cli queries"                   # list registered queries
  * }}}
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "verify" :: rest if rest.size == 2 => Verify.main(rest.toArray)
    case "bench" :: _ => Bench.main(Array.empty)
    case "explain" :: rest => tools.Explain.main(rest.toArray)
    case "scale" :: rest => tools.ScaleBench.main(rest.toArray)
    case "demo" :: _ => Demo.main(Array.empty)
    case "queries" :: _ =>
      queries.QueryRegistry.all.sortBy(_.name).foreach { q =>
        val kind = if (q.oracle.isDefined) "oracle" else "rows-only"
        println(f"${q.name}%-28s $kind")
      }
    case "health" :: _ =>
      // fixture-probed sweep (this build has zero egress): demonstrates
      // the D8 surface — deployments register real HTTP probes in the
      // same SourceCheck seam (see graft.health.Checker)
      import graft.health._
      val checks = Seq(
        SourceCheck("cepea", () => Probe("<html/>", Some(0.97), Some(22L), Some(120L))),
        SourceCheck("conab", () => Probe("<html/>", None, None, Some(5400L))),
        SourceCheck("ibge", () => throw new RuntimeException("connect timeout (fixture)")))
      val sweep = Checker.runAll(checks)
      sweep.foreach(r =>
        println(f"${r.source}%-8s ${r.status}%-8s ${r.latencyMs}%6d ms  ${r.message}"))
      new AlertService(Seq(new LogNotifier)).dispatch(sweep)
      ()
    case other =>
      System.err.println(
        s"unknown command ${other.mkString(" ")}; use: verify <sfDir> <outDir> | bench | explain [q...] | scale [q...] | demo | queries | health")
      sys.exit(2)
  }
}
