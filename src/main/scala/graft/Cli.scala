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
    case other =>
      System.err.println(
        s"unknown command ${other.mkString(" ")}; use: verify <sfDir> <outDir> | bench | explain [q...] | scale [q...] | demo | queries")
      sys.exit(2)
  }
}
