package graft.health

import java.time.{Duration, LocalTime}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source service-level objectives (reference `sla.py:11-95`:
  * `Tier`, `FreshnessPolicy`, `LatencyTarget`, `AvailabilityTarget`,
  * `DataQualityTarget`, `SourceSLA` + module registry/summary at
  * `:204-233`). The reference module is a static policy catalogue; the
  * engine keeps the same model AND evaluates it — observed per-request
  * latencies (the Telemetry seam in `ingest/Resilience.scala`) are
  * scored against the percentile targets, probe sweeps against the
  * availability target, and a table's timestamp high-water mark against
  * the freshness policy — so an SLA is a checkable contract, not
  * documentation.
  */
object Tier {
  val Critical = "critical"
  val Standard = "standard"
  val BestEffort = "best_effort"
}

final case class FreshnessPolicy(
    updateFrequency: String, // "daily" | "monthly" | ...
    updateTime: Option[LocalTime] = None,
    timezone: String = "America/Sao_Paulo",
    weekends: Boolean = false,
    holidays: Boolean = false) {
  /** The staleness bound the policy implies, with one full publication
    * interval of grace (a daily source is late after missing 2 cycles,
    * which is how the reference's cache-expiry note treats it).
    */
  def maxAgeHours: Long = updateFrequency match {
    case "hourly" => 2L
    case "daily" => 48L
    case "weekly" => 14L * 24L
    case "monthly" => 62L * 24L
    case _ => 365L * 24L
  }
}

final case class LatencyTarget(p50Ms: Long, p95Ms: Long, p99Ms: Long,
    timeoutMs: Long)

final case class AvailabilityTarget(uptimePct: Double,
    plannedMaintenanceWindow: Option[String] = None,
    degradedModeAvailable: Boolean = true)

final case class DataQualityTarget(completenessPct: Double = 99.0,
    accuracyChecks: Boolean = true, schemaValidation: Boolean = true,
    anomalyDetection: Boolean = true)

final case class SourceSla(
    source: String,
    tier: String,
    freshness: FreshnessPolicy,
    latency: LatencyTarget,
    availability: AvailabilityTarget,
    dataQuality: DataQualityTarget,
    fallbackSources: Seq[String] = Nil,
    notes: String = "")

/** One evaluated objective: observed vs target, pass/fail. */
final case class SlaFinding(source: String, objective: String,
    observed: Double, target: Double, met: Boolean)

object Sla {

  /** The reference's four shipped SLAs (`sla.py:97-202`), same tiers
    * and numbers, keyed by source name.
    */
  val defaults: Map[String, SourceSla] = Seq(
    SourceSla("cepea", Tier.Critical,
      FreshnessPolicy("daily", Some(LocalTime.of(18, 0))),
      LatencyTarget(500, 2000, 5000, 30000),
      AvailabilityTarget(99.0),
      DataQualityTarget(99.0, accuracyChecks = true, schemaValidation = true,
        anomalyDetection = true),
      fallbackSources = Seq("noticias_agricolas"),
      notes = "daily indicator published 18:00; cache expires next 18:00"),
    SourceSla("conab", Tier.Standard,
      FreshnessPolicy("monthly"),
      LatencyTarget(1000, 3000, 10000, 60000),
      AvailabilityTarget(95.0),
      DataQualityTarget(95.0, accuracyChecks = true, schemaValidation = true,
        anomalyDetection = false),
      notes = "monthly bulletins"),
    SourceSla("ibge", Tier.Standard,
      FreshnessPolicy("monthly"),
      LatencyTarget(800, 2500, 8000, 45000),
      AvailabilityTarget(98.0),
      DataQualityTarget(98.0, accuracyChecks = true, schemaValidation = true,
        anomalyDetection = false),
      notes = "SIDRA API; PAM yearly, LSPA monthly"),
    SourceSla("noticias_agricolas", Tier.BestEffort,
      FreshnessPolicy("daily", Some(LocalTime.of(19, 0))),
      LatencyTarget(1500, 5000, 15000, 45000),
      AvailabilityTarget(90.0, degradedModeAvailable = false),
      DataQualityTarget(90.0, accuracyChecks = false, schemaValidation = true,
        anomalyDetection = false),
      notes = "fallback for cepea")
  ).map(s => s.source -> s).toMap

  def get(source: String): Option[SourceSla] = defaults.get(source)
  def list: Seq[SourceSla] = defaults.values.toSeq.sortBy(_.source)

  /** Tier semantics, verbatim from the reference summary. */
  val tierSummary: Map[String, String] = Map(
    Tier.Critical -> "99%+ uptime, daily freshness, full validation",
    Tier.Standard -> "95%+ uptime, monthly freshness, schema validation",
    Tier.BestEffort -> "90%+ uptime, fallback source, basic validation")

  /** Exact percentile by the nearest-rank method over a bounded
    * per-source sample (requests to ONE source over an evaluation
    * window are driver-scale; table-scale latency columns go through
    * `percentile_approx` in the Spark path below).
    */
  private def nearestRank(sorted: IndexedSeq[Long], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.length - 1,
      math.max(0, math.ceil(p / 100.0 * sorted.length).toInt - 1))).toDouble

  /** Scores observed request latencies against the percentile targets. */
  def evaluateLatency(sla: SourceSla, observedMs: Seq[Long]): Seq[SlaFinding] = {
    val s = observedMs.sorted.toIndexedSeq
    Seq(
      ("latency_p50_ms", nearestRank(s, 50), sla.latency.p50Ms.toDouble),
      ("latency_p95_ms", nearestRank(s, 95), sla.latency.p95Ms.toDouble),
      ("latency_p99_ms", nearestRank(s, 99), sla.latency.p99Ms.toDouble),
      ("latency_max_under_timeout_ms",
        s.lastOption.fold(0.0)(_.toDouble), sla.latency.timeoutMs.toDouble)
    ).map { case (name, obs, tgt) =>
      SlaFinding(sla.source, name, obs, tgt, met = obs <= tgt)
    }
  }

  /** Scores a probe sweep against the availability target. */
  def evaluateAvailability(sla: SourceSla,
      results: Seq[CheckResult]): SlaFinding = {
    val mine = results.filter(_.source == sla.source)
    val up = mine.count(_.status == CheckStatus.Ok)
    val pct = if (mine.isEmpty) 0.0 else up.toDouble * 100.0 / mine.size
    SlaFinding(sla.source, "availability_uptime_pct", pct,
      sla.availability.uptimePct, met = pct >= sla.availability.uptimePct)
  }

  /** Scores a table's high-water mark against the freshness policy —
    * v13's "hours behind" arithmetic as an SLA objective.
    */
  def evaluateFreshness(sla: SourceSla, maxTsEpochMs: Long,
      nowEpochMs: Long): SlaFinding = {
    val behindH = Duration.ofMillis(nowEpochMs - maxTsEpochMs).toHours
    SlaFinding(sla.source, "freshness_hours_behind", behindH.toDouble,
      sla.freshness.maxAgeHours.toDouble,
      met = behindH <= sla.freshness.maxAgeHours)
  }

  /** Distributed latency scoring for TABLE-scale request logs: one
    * aggregation pass per evaluation (`percentile_approx` with the
    * exactness accuracy bound), grouped by source, joined to targets —
    * no per-source collect, so a billion-row log evaluates in one job.
    * Expects (source STRING, duration_ms LONG) columns.
    */
  def evaluateLatencyDf(spark: SparkSession, requests: DataFrame,
      slas: Seq[SourceSla] = list): DataFrame = {
    import spark.implicits._
    val targets = slas.map(s =>
      (s.source, s.latency.p50Ms, s.latency.p95Ms, s.latency.p99Ms,
        s.latency.timeoutMs))
      .toDF("source", "p50_target", "p95_target", "p99_target", "timeout_target")
    requests
      .groupBy(col("source"))
      .agg(
        percentile_approx(col("duration_ms"), lit(0.5), lit(10000)).as("p50_obs"),
        percentile_approx(col("duration_ms"), lit(0.95), lit(10000)).as("p95_obs"),
        percentile_approx(col("duration_ms"), lit(0.99), lit(10000)).as("p99_obs"),
        max(col("duration_ms")).as("max_obs"))
      .join(broadcast(targets), Seq("source"))
      .withColumn("met",
        col("p50_obs") <= col("p50_target") &&
          col("p95_obs") <= col("p95_target") &&
          col("p99_obs") <= col("p99_target") &&
          col("max_obs") <= col("timeout_target"))
      .orderBy(col("source"))
  }

  /** Full per-source scorecard from the live seams: telemetry
    * latencies + probe sweep (+ optional freshness high-water marks).
    */
  def scorecard(telemetry: Map[String, Seq[Long]],
      sweep: Seq[CheckResult],
      freshnessMs: Map[String, (Long, Long)] = Map.empty,
      slas: Seq[SourceSla] = list): Seq[SlaFinding] =
    slas.flatMap { sla =>
      telemetry.get(sla.source).toSeq.flatMap(evaluateLatency(sla, _)) ++
        (if (sweep.exists(_.source == sla.source))
          Seq(evaluateAvailability(sla, sweep)) else Nil) ++
        freshnessMs.get(sla.source).map { case (maxTs, now) =>
          evaluateFreshness(sla, maxTs, now) }.toSeq
    }.sortBy(f => (f.source, f.objective))
}
