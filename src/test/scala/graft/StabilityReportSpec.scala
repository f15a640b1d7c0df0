package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Stability
import graft.health._

/** API stability registry (reference `stability.py`) + health report
  * (reference `health/reporter.py`) — no Spark needed.
  */
class StabilityReportSpec extends AnyFunSuite {

  test("stability registry: statuses, listings, first-use warnings") {
    Stability.clear()
    Stability.stable("Graft.fetch", since = "0.3.0")
    Stability.experimental("Graft.hybridSearch", since = "0.8.0")
    Stability.deprecated("Graft.fetchLegacy", since = "0.5.0",
      removedIn = Some("1.0.0"), replacement = Some("Graft.fetch"))
    Stability.internal("Graft.commitInner")

    assert(Stability.listStable == Seq("Graft.fetch"))
    assert(Stability.listExperimental == Seq("Graft.hybridSearch"))
    assert(Stability.listDeprecated == Seq("Graft.fetchLegacy"))
    assert(Stability.apiInfo("Graft.fetchLegacy").get.replacement
      .contains("Graft.fetch"))
    assert(Stability.apiRegistry.size == 4)

    def stderrOf(f: => Unit): String = {
      val buf = new ByteArrayOutputStream()
      Console.withErr(new PrintStream(buf, true, "UTF-8")) {
        val old = System.err
        System.setErr(new PrintStream(buf, true, "UTF-8"))
        try f finally System.setErr(old)
      }
      buf.toString("UTF-8")
    }
    // deprecated warns on FIRST call only, with the full message
    val first = stderrOf(assert(Stability.guard("Graft.fetchLegacy")(41 + 1) == 42))
    assert(first.contains("deprecated since 0.5.0") &&
      first.contains("removed in 1.0.0") && first.contains("Use Graft.fetch"))
    val second = stderrOf(Stability.guard("Graft.fetchLegacy")(()))
    assert(!second.contains("deprecated"))
    // stable and unannotated APIs never warn
    assert(stderrOf(Stability.guard("Graft.fetch")(())).isEmpty)
    assert(stderrOf(Stability.guard("not.registered")(())).isEmpty)
    Stability.clear()
  }

  test("health report: summary math, views, json and markdown round out") {
    val now = Instant.parse("2024-01-10T12:00:00Z")
    val rs = Seq(
      CheckResult("cepea", CheckStatus.Ok, 100L, "ok", now),
      CheckResult("conab", CheckStatus.Warning, 300L, "slow", now),
      CheckResult("ibge", CheckStatus.Failed, 0L, "connect \"timeout\"", now))
    val rep = HealthReport(rs, at = now)
    assert(rep.totalChecks == 3 && rep.okCount == 1 &&
      rep.warningCount == 1 && rep.failedCount == 1)
    assert(!rep.allPassed && rep.hasWarnings)
    assert(rep.failures.map(_.source) == Seq("ibge"))
    assert(rep.warnings.map(_.source) == Seq("conab"))
    assert(math.abs(rep.successRate - 1.0 / 3) < 1e-12)
    assert(math.abs(rep.avgLatencyMs - 400.0 / 3) < 1e-9)

    val json = rep.toJson
    assert(json.contains("\"total_checks\":3") &&
      json.contains("\"all_passed\":false") &&
      json.contains("connect \\\"timeout\\\"")) // escaped, still one record
    val md = rep.toMarkdown
    assert(md.contains("# Health Check Report") && md.contains("| cepea | ok |"))

    val dir = Files.createTempDirectory("graft_report")
    rep.save(s"$dir/r.json")
    rep.save(s"$dir/r.md", format = "md")
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/r.json")) == json)
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/r.md")) == md)
    intercept[IllegalArgumentException] { rep.save(s"$dir/r.html", "html") }

    // an all-green sweep
    val green = HealthReport(Seq(CheckResult("cepea", CheckStatus.Ok, 5L, "", now)))
    assert(green.allPassed && !green.hasWarnings && green.successRate == 1.0)
    assert(HealthReport(Nil).successRate == 0.0) // empty sweep: defined, not NaN
  }
}
