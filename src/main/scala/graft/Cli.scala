package graft

import org.apache.spark.sql.SparkSession

/** D10 — CLI over the library (reference `cli.py:23-419` exposes
  * cepea/conab/ibge/cache/snapshot/health subcommands; here the
  * engine-side equivalents — the reference's per-source fetch verbs
  * collapse into `verify`/`queries`, which exercise every registered
  * pipeline):
  *
  * {{{
  * sbt "runMain graft.Cli verify <sfDir> <outDir>"   # correctness dump
  * sbt "runMain graft.Cli bench"                     # timed run (env-config)
  * sbt "runMain graft.Cli explain [query...]"        # plan audit
  * sbt "runMain graft.Cli scale [query...]"          # scale-trend bench (SCALE.md)
  * sbt "runMain graft.Cli demo"                      # library tour
  * sbt "runMain graft.Cli queries"                   # list registered queries
  * sbt "runMain graft.Cli plugins"                   # list registered plugins
  * sbt "runMain graft.Cli health"                    # probe sweep + alerts
  * sbt "runMain graft.Cli cache stats <path>"        # KV cache audit
  * sbt "runMain graft.Cli cache purge-legacy <path>" # drop pre-versioning keys
  * sbt "runMain graft.Cli snapshot list <base>"      # snapshots under a root
  * sbt "runMain graft.Cli snapshot show <base> <name>"        # manifest
  * sbt "runMain graft.Cli snapshot create <base> <name> <sfDir> <table...>"
  * }}}
  */
object Cli {

  /** Local session for the store verbs; built only when a verb needs
    * one (listing queries/plugins must not pay Spark startup).
    */
  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

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
    case "plugins" :: _ =>
      val ps = plugins.Plugins.list
      if (ps.isEmpty) println("no plugins registered")
      else ps.foreach(m =>
        println(f"${m.name}%-24s ${m.version}%-8s ${m.description}"))
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
    case "cache" :: "stats" :: path :: Nil =>
      val kv = new store.KvCache(session(), path)
      kv.load()
      val legacy = store.Policies.isLegacyKey _
      // re-read entries through the public surface: per-key hit counts
      val keys = session().read.parquet(path)
        .select("key", "hitCount", "ttlSeconds").collect()
        .sortBy(_.getString(0))
      println(s"entries: ${keys.length}")
      println(s"legacy keys: ${keys.count(r => legacy(r.getString(0)))}")
      keys.foreach(r =>
        println(f"${r.getString(0)}%-48s hits=${r.getLong(1)}%-6d ttl=${r.getLong(2)}s"))
    case "cache" :: "purge-legacy" :: path :: Nil =>
      val kv = new store.KvCache(session(), path)
      kv.load()
      val n = kv.purgeLegacyKeys()
      kv.persist()
      println(s"purged $n legacy keys")
    case "snapshot" :: "list" :: base :: Nil =>
      val names = store.Snapshots.list(base)
      if (names.isEmpty) println(s"no snapshots under $base")
      else names.foreach(println)
    case "snapshot" :: "show" :: base :: name :: Nil =>
      println(store.Snapshots.manifest(base, name))
    case "snapshot" :: "create" :: base :: name :: sfDir :: tables if tables.nonEmpty =>
      val s = session()
      val entries = store.Snapshots.create(s, base, name,
        tables.map(t => s"driver/$t" -> queries.T.load(s, sfDir, t)).toMap)
      entries.foreach(e => println(s"captured ${e.source}/${e.dataset}: ${e.rows} rows"))
    case other =>
      System.err.println(
        s"unknown command ${other.mkString(" ")}; use: verify <sfDir> <outDir> | bench | " +
          "explain [q...] | scale [q...] | demo | queries | plugins | health | " +
          "cache stats|purge-legacy <path> | snapshot list|show|create ...")
      sys.exit(2)
  }
}
