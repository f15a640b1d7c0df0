package graft.health

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

/** D8 — per-source health checks + alert dispatch (reference
  * `agrobr/health/checker.py:18-266`, `agrobr/alerts/notifier.py:16-52`).
  *
  * The reference's checkers fetch a live page/API and grade the probe
  * through a fixed decision ladder; its notifier fans an alert out to
  * every configured channel with per-channel failure isolation. This
  * module keeps exactly those semantics but injects the PROBE and the
  * CHANNEL: this build has zero egress, so the HTTP fetch and the
  * webhook POST are deliberate non-goals — a deployment drops an
  * httpx-equivalent probe and a webhook [[Notifier]] into the same
  * seams the fixture-driven specs exercise. Control-plane code runs
  * driver-side by design (checks are per-source singletons, not data);
  * results land in a DataFrame ([[Checker.toDf]]) so health history is
  * a queryable table like everything else.
  */
object CheckStatus {
  val Ok = "ok"
  val Warning = "warning"
  val Failed = "failed"
}

/** What a probe observed. `latencyMs` is measured by the harness but a
  * fixture may pin it (deterministic specs). `structuralSimilarity` is
  * the fingerprint score vs the stored baseline when the source has one
  * (reference `cepea/parsers/fingerprint.py` via `checker.py:60-78`);
  * `recordsParsed` is the parse-smoke count (`checker.py:80-90`).
  */
final case class Probe(
    payload: String,
    structuralSimilarity: Option[Double] = None,
    recordsParsed: Option[Long] = None,
    latencyMsOverride: Option[Long] = None)

final case class CheckResult(
    source: String,
    status: String,
    latencyMs: Long,
    message: String,
    checkedAt: Instant)

/** One registered source: a probe thunk plus its grading thresholds
  * (reference values: warn at 5 s latency, fail under 0.70 structural
  * similarity, drift-warn under 0.85 — `checker.py:49,66,77`).
  */
final case class SourceCheck(
    source: String,
    probe: () => Probe,
    latencyWarnMs: Long = 5000L,
    similarityFail: Double = 0.70,
    similarityWarn: Double = 0.85)

object Checker {

  /** The reference's decision ladder, in its order (`checker.py:34-117`):
    * probe failure → FAILED; high latency → WARNING (remaining checks
    * skipped); similarity below the fail floor → FAILED; empty parse →
    * FAILED; similarity drift → WARNING; else OK.
    */
  def runCheck(check: SourceCheck, now: Instant = Instant.now()): CheckResult = {
    val t0 = System.nanoTime()
    def elapsedMs = (System.nanoTime() - t0) / 1000000L
    try {
      val p = check.probe()
      val latency = p.latencyMsOverride.getOrElse(elapsedMs)
      if (latency > check.latencyWarnMs)
        CheckResult(check.source, CheckStatus.Warning, latency,
          s"High latency: ${latency}ms", now)
      else if (p.structuralSimilarity.exists(_ < check.similarityFail))
        CheckResult(check.source, CheckStatus.Failed, latency,
          f"Layout changed significantly: ${p.structuralSimilarity.get * 100}%.1f%% similarity", now)
      else if (p.recordsParsed.contains(0L))
        CheckResult(check.source, CheckStatus.Failed, latency,
          "Parser returned no results", now)
      else if (p.structuralSimilarity.exists(_ < check.similarityWarn))
        CheckResult(check.source, CheckStatus.Warning, latency,
          "Fingerprint drift detected", now)
      else
        CheckResult(check.source, CheckStatus.Ok, latency, "All checks passed", now)
    } catch {
      case e: Exception =>
        CheckResult(check.source, CheckStatus.Failed, elapsedMs,
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName), now)
    }
  }

  /** Run every registered check; an unknown source name asked of the
    * registry grades FAILED rather than throwing (`checker.py:243-253`).
    */
  def runAll(checks: Seq[SourceCheck], now: Instant = Instant.now()): Seq[CheckResult] =
    checks.map(runCheck(_, now))

  def checkSource(checks: Seq[SourceCheck], source: String,
      now: Instant = Instant.now()): CheckResult =
    checks.find(_.source == source).map(runCheck(_, now))
      .getOrElse(CheckResult(source, CheckStatus.Failed, 0L,
        s"Unknown source: $source", now))

  /** Health history as a table: append each sweep and the freshness /
    * flakiness queries are ordinary aggregations.
    */
  def toDf(spark: SparkSession, results: Seq[CheckResult]): DataFrame = {
    import spark.implicits._
    results.map(r => (r.source, r.status, r.latencyMs, r.message,
      java.sql.Timestamp.from(r.checkedAt)))
      .toDF("source", "status", "latency_ms", "message", "checked_at")
  }
}

/** Sweep report (reference `health/reporter.py:16-140`: summary with
  * counts/success-rate/avg-latency, failures/warnings views, JSON and
  * markdown rendering, save-to-path). Same derivations; JSON via the
  * repo-standard manual escaping (zero deps).
  */
final case class HealthReport(results: Seq[CheckResult],
    at: Instant = Instant.now()) {

  lazy val totalChecks: Int = results.size
  lazy val okCount: Int = results.count(_.status == CheckStatus.Ok)
  lazy val warningCount: Int = results.count(_.status == CheckStatus.Warning)
  lazy val failedCount: Int = results.count(_.status == CheckStatus.Failed)
  lazy val successRate: Double =
    if (totalChecks == 0) 0.0 else okCount.toDouble / totalChecks
  lazy val avgLatencyMs: Double =
    if (totalChecks == 0) 0.0 else results.map(_.latencyMs).sum.toDouble / totalChecks
  def allPassed: Boolean = failedCount == 0
  def hasWarnings: Boolean = warningCount > 0
  def failures: Seq[CheckResult] = results.filter(_.status == CheckStatus.Failed)
  def warnings: Seq[CheckResult] = results.filter(_.status == CheckStatus.Warning)

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def toJson: String = {
    val checks = results.map(r =>
      s"""{"source":"${esc(r.source)}","status":"${r.status}",""" +
        s""""latency_ms":${r.latencyMs},"message":"${esc(r.message)}",""" +
        s""""checked_at":"${r.checkedAt}"}""").mkString("[", ",", "]")
    s"""{"timestamp":"$at","summary":{"total_checks":$totalChecks,""" +
      s""""ok":$okCount,"warnings":$warningCount,"failures":$failedCount,""" +
      s""""success_rate":$successRate,"avg_latency_ms":$avgLatencyMs,""" +
      s""""all_passed":$allPassed,"has_warnings":$hasWarnings},""" +
      s""""checks":$checks}"""
  }

  def toMarkdown: String = {
    val rows = results.map(r =>
      s"| ${r.source} | ${r.status} | ${r.latencyMs} ms | ${r.message} |")
    (Seq("# Health Check Report", "", s"**Timestamp:** $at", "",
      "## Summary", "",
      s"- Total checks: $totalChecks", s"- OK: $okCount",
      s"- Warnings: $warningCount", s"- Failures: $failedCount",
      f"- Success rate: ${successRate * 100}%.1f%%",
      f"- Average latency: $avgLatencyMs%.0fms", "",
      "## Results", "", "| source | status | latency | message |",
      "| --- | --- | --- | --- |") ++ rows).mkString("\n") + "\n"
  }

  /** Writes the report; format from the extension-style argument. */
  def save(path: String, format: String = "json"): Unit = {
    val body = format match {
      case "json" => toJson
      case "md" => toMarkdown
      case other => throw new IllegalArgumentException(
        s"unsupported report format: $other (json|md)")
    }
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, body)
  }
}

object AlertLevel {
  val Info = "info"
  val Warning = "warning"
  val Critical = "critical"
  val rank: Map[String, Int] = Map(Info -> 0, Warning -> 1, Critical -> 2)
}

final case class Alert(
    level: String,
    title: String,
    source: Option[String],
    details: Map[String, String],
    at: Instant)

/** One delivery channel. Webhook/email channels (reference
  * `alerts/notifier.py:56-131`) implement this trait in deployments;
  * this build ships log/file/in-memory channels only (zero egress).
  */
trait Notifier {
  def name: String
  def send(alert: Alert): Unit
}

final class LogNotifier extends Notifier {
  val name = "log"
  def send(a: Alert): Unit =
    System.err.println(s"[alert:${a.level}] ${a.title}" +
      a.source.map(s => s" source=$s").getOrElse(""))
}

/** Append-only JSONL channel — the durable no-network default. */
final class FileNotifier(path: String) extends Notifier {
  val name = "file"
  def send(a: Alert): Unit = {
    // full JSON string escaping including control characters — an alert
    // title carrying an exception message with newlines must still land
    // as ONE parseable JSONL record
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val line = s"""{"level":"${a.level}","title":"${esc(a.title)}",""" +
      s""""source":${a.source.map(s => "\"" + esc(s) + "\"").getOrElse("null")},""" +
      s""""at":"${a.at}"}"""
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, java.util.Arrays.asList(line),
      java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}

/** Test/inspection channel. */
final class InMemoryNotifier extends Notifier {
  val name = "memory"
  val received = scala.collection.mutable.ArrayBuffer.empty[Alert]
  def send(a: Alert): Unit = received.synchronized { received += a }
}

/** Fan-out alert dispatch with the reference's semantics
  * (`alerts/notifier.py:22-52`): disabled → no-op; below the minimum
  * level → dropped; every configured channel gets every alert, and one
  * failing channel never blocks the rest (failures are collected, not
  * thrown). `alertsFor` maps a health sweep to alerts: FAILED →
  * critical, WARNING → warning, OK → nothing.
  */
final class AlertService(
    channels: Seq[Notifier],
    enabled: Boolean = true,
    minLevel: String = AlertLevel.Info) {

  /** (delivered count, per-channel failures). */
  def send(alert: Alert): (Int, Seq[(String, String)]) = {
    if (!enabled || AlertLevel.rank(alert.level) < AlertLevel.rank(minLevel))
      return (0, Seq.empty)
    val outcomes = channels.map { ch =>
      try { ch.send(alert); Right(ch.name) }
      catch { case e: Exception =>
        Left(ch.name -> Option(e.getMessage).getOrElse(e.getClass.getSimpleName)) }
    }
    (outcomes.count(_.isRight), outcomes.collect { case Left(f) => f })
  }

  def alertsFor(results: Seq[CheckResult]): Seq[Alert] =
    results.collect {
      case r if r.status == CheckStatus.Failed =>
        Alert(AlertLevel.Critical, s"Health check failed: ${r.source}",
          Some(r.source), Map("message" -> r.message,
            "latency_ms" -> r.latencyMs.toString), r.checkedAt)
      case r if r.status == CheckStatus.Warning =>
        Alert(AlertLevel.Warning, s"Health check warning: ${r.source}",
          Some(r.source), Map("message" -> r.message,
            "latency_ms" -> r.latencyMs.toString), r.checkedAt)
    }

  def dispatch(results: Seq[CheckResult]): Seq[(Alert, Int, Seq[(String, String)])] =
    alertsFor(results).map { a => val (n, f) = send(a); (a, n, f) }
}
