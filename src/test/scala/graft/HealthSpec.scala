package graft

import java.time.Instant

import graft.health._

/** D8 — fixture-driven health checks + alert dispatch: the decision
  * ladder (latency → layout → parse), the unknown-source grade, and
  * the notifier fan-out with per-channel failure isolation.
  */
class HealthSpec extends SparkSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_health").toString

  private val now = Instant.parse("2024-06-01T12:00:00Z")
  private def probe(sim: Option[Double] = None, recs: Option[Long] = None,
      latency: Long = 100L): () => Probe =
    () => Probe("<html>fixture</html>", sim, recs, Some(latency))

  test("decision ladder grades in the reference's order") {
    // all green
    val ok = Checker.runCheck(SourceCheck("cepea",
      probe(sim = Some(0.95), recs = Some(12L))), now)
    assert(ok.status == CheckStatus.Ok && ok.message == "All checks passed")
    // high latency wins over everything downstream (checked first)
    val slow = Checker.runCheck(SourceCheck("conab",
      probe(sim = Some(0.50), latency = 9000L)), now)
    assert(slow.status == CheckStatus.Warning && slow.message.startsWith("High latency"))
    // layout fail under the 0.70 floor
    val drifted = Checker.runCheck(SourceCheck("cepea", probe(sim = Some(0.60))), now)
    assert(drifted.status == CheckStatus.Failed &&
      drifted.message.contains("Layout changed significantly"))
    // empty parse fails even with a healthy layout
    val empty = Checker.runCheck(SourceCheck("cepea",
      probe(sim = Some(0.95), recs = Some(0L))), now)
    assert(empty.status == CheckStatus.Failed &&
      empty.message == "Parser returned no results")
    // drift band [0.70, 0.85) warns
    val warn = Checker.runCheck(SourceCheck("cepea",
      probe(sim = Some(0.80), recs = Some(12L))), now)
    assert(warn.status == CheckStatus.Warning &&
      warn.message == "Fingerprint drift detected")
    // probe exception -> failed with the message
    val dead = Checker.runCheck(SourceCheck("ibge",
      () => throw new RuntimeException("connect timeout")), now)
    assert(dead.status == CheckStatus.Failed && dead.message == "connect timeout")
  }

  test("registry: runAll sweeps every source, unknown source grades failed") {
    val checks = Seq(
      SourceCheck("cepea", probe(recs = Some(3L))),
      SourceCheck("conab", probe(latency = 8000L)),
      SourceCheck("ibge", () => throw new RuntimeException("down")))
    val sweep = Checker.runAll(checks, now)
    assert(sweep.map(_.status) == Seq(CheckStatus.Ok, CheckStatus.Warning, CheckStatus.Failed))
    val unknown = Checker.checkSource(checks, "nasa", now)
    assert(unknown.status == CheckStatus.Failed &&
      unknown.message == "Unknown source: nasa")
    // health history is a queryable table
    val df = Checker.toDf(spark, sweep)
    assert(df.columns.toSeq ==
      Seq("source", "status", "latency_ms", "message", "checked_at"))
    assert(df.filter(df("status") === "failed").count() == 1)
  }

  test("alert fan-out: per-channel isolation, level floor, disabled service") {
    val good1 = new InMemoryNotifier
    val good2 = new InMemoryNotifier
    val broken = new Notifier {
      val name = "webhook"
      def send(a: Alert): Unit = throw new RuntimeException("HTTP 500")
    }
    val svc = new AlertService(Seq(good1, broken, good2))
    val sweep = Checker.runAll(Seq(
      SourceCheck("cepea", probe(recs = Some(3L))), // ok -> no alert
      SourceCheck("conab", probe(latency = 8000L)), // warning
      SourceCheck("ibge", () => throw new RuntimeException("down"))), now) // critical
    val dispatched = svc.dispatch(sweep)
    assert(dispatched.length == 2) // ok produces nothing
    // one broken channel never blocks the others
    dispatched.foreach { case (_, delivered, failures) =>
      assert(delivered == 2 && failures == Seq("webhook" -> "HTTP 500"))
    }
    assert(good1.received.map(_.level) == Seq(AlertLevel.Warning, AlertLevel.Critical))
    assert(good2.received.size == 2)
    // level floor: criticals only
    val crit = new InMemoryNotifier
    val critOnly = new AlertService(Seq(crit), minLevel = AlertLevel.Critical)
    critOnly.dispatch(sweep)
    assert(crit.received.map(_.level) == Seq(AlertLevel.Critical))
    // disabled -> nothing delivered anywhere
    val off = new InMemoryNotifier
    val disabled = new AlertService(Seq(off), enabled = false)
    assert(disabled.dispatch(sweep).forall(_._2 == 0) && off.received.isEmpty)
  }

  test("file notifier appends JSONL alert lines") {
    val path = tmp() + "/alerts.jsonl"
    val svc = new AlertService(Seq(new FileNotifier(path)))
    svc.send(Alert(AlertLevel.Critical, "Health check failed: cepea",
      Some("cepea"), Map.empty, now))
    svc.send(Alert(AlertLevel.Warning, "drift \"quoted\"", None, Map.empty, now))
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.length == 2)
    assert(lines.head.contains("\"level\":\"critical\"") &&
      lines.head.contains("\"source\":\"cepea\""))
    assert(lines(1).contains("\\\"quoted\\\"") && lines(1).contains("\"source\":null"))
  }
}
