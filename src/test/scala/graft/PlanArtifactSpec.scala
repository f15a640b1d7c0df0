package graft

import java.nio.file.{Files, Paths}

import graft.tools.PlanReport

/** The committed PLANS.md must equal what PlanReport would write for
  * the CURRENT registry and plans — recomputed here with the exact
  * writer code, so a new query, a removed query, or a plan-shape change
  * (a gained Exchange, a lost pushdown, a new BNLJ) that isn't followed
  * by a `runMain graft.tools.PlanReport` refresh fails `sbt test`
  * instead of shipping a stale artifact. (PlanLintSpec enforces the
  * hard structural rules; this pins the REPORT to reality.)
  */
class PlanArtifactSpec extends SparkSuite {

  test("committed PLANS.md matches the live plans row-for-row") {
    graft.functions.GraftFunctions.register(spark)
    // Earlier suites cache frames over the same testdata parquet; the
    // shared CacheManager would then swap InMemoryRelation into the
    // recomputed plans and report phantom drift (scan/pushdown cells).
    // PlanReport's main runs in a fresh session; match that here.
    spark.catalog.clearCache()
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run graft.tools.PlanReport")
    val committed = Files.readString(path)
    val live = PlanReport.render(
      PlanReport.computeRows(spark, "/root/testdata/sf0.001"))

    def table(s: String): Map[String, String] =
      s.linesIterator.filter(l => l.startsWith("| ") && !l.startsWith("| ---"))
        .drop(1) // header row
        .map(l => l.split("\\|")(1).trim -> l.trim).toMap

    val c = table(committed)
    val l = table(live)
    val diffs =
      (l.keySet -- c.keySet).toSeq.sorted.map(q => s"NOT IN PLANS.md: ${l(q)}") ++
      (c.keySet -- l.keySet).toSeq.sorted.map(q => s"GONE FROM REGISTRY: $q") ++
      (c.keySet & l.keySet).toSeq.sorted.collect {
        case q if c(q) != l(q) => s"DRIFTED: committed ${c(q)}\n         live      ${l(q)}"
      }
    assert(diffs.isEmpty,
      s"""PLANS.md is stale — refresh with `sbt "runMain graft.tools.PlanReport"`:
         |${diffs.take(12).mkString("\n")}""".stripMargin)
  }
}
