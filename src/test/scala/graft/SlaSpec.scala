package graft

import java.time.Instant

import graft.health._

/** SLA model + evaluation (reference `sla.py`): registry parity, then
  * the engine-only part — scoring observed latencies, probe sweeps and
  * freshness marks against the targets, single-node and as one Spark
  * aggregation pass.
  */
class SlaSpec extends SparkSuite {
  import spark.implicits._

  test("registry carries the reference's four SLAs with their tiers") {
    assert(Sla.list.map(_.source) ==
      Seq("cepea", "conab", "ibge", "noticias_agricolas"))
    val cepea = Sla.get("cepea").get
    assert(cepea.tier == Tier.Critical &&
      cepea.latency == LatencyTarget(500, 2000, 5000, 30000) &&
      cepea.availability.uptimePct == 99.0 &&
      cepea.fallbackSources == Seq("noticias_agricolas"))
    assert(Sla.get("conab").get.freshness.maxAgeHours == 62L * 24L)
    assert(Sla.tierSummary.keySet ==
      Set(Tier.Critical, Tier.Standard, Tier.BestEffort))
  }

  test("latency findings: percentiles score against targets") {
    val sla = Sla.get("cepea").get
    // 100 requests: p50=400 (ok), p95 lands at 2500 (breach), p99 at
    // 2500 (ok, target 5000), max under timeout
    val obs = (Seq.fill(90)(400L) ++ Seq.fill(10)(2500L))
    val byName = Sla.evaluateLatency(sla, obs).map(f => f.objective -> f).toMap
    assert(byName("latency_p50_ms").met &&
      byName("latency_p50_ms").observed == 400.0)
    assert(!byName("latency_p95_ms").met &&
      byName("latency_p95_ms").observed == 2500.0)
    assert(byName("latency_p99_ms").met)
    assert(byName("latency_max_under_timeout_ms").met)
  }

  test("availability + freshness findings") {
    val sla = Sla.get("conab").get // 95% target
    val now = Instant.parse("1997-01-01T00:00:00Z")
    def result(st: String) = CheckResult("conab", st, 10L, "", now)
    val pass = Sla.evaluateAvailability(sla,
      Seq.fill(19)(result(CheckStatus.Ok)) :+ result(CheckStatus.Failed))
    assert(pass.met && pass.observed == 95.0)
    val fail = Sla.evaluateAvailability(sla,
      Seq.fill(9)(result(CheckStatus.Ok)) :+ result(CheckStatus.Failed))
    assert(!fail.met && fail.observed == 90.0)

    val fresh = Sla.evaluateFreshness(sla,
      maxTsEpochMs = now.toEpochMilli - 61L * 24 * 3600 * 1000,
      nowEpochMs = now.toEpochMilli)
    assert(fresh.met) // 61 days behind, monthly bound is 62 days
    assert(!Sla.evaluateFreshness(sla,
      maxTsEpochMs = now.toEpochMilli - 63L * 24 * 3600 * 1000,
      nowEpochMs = now.toEpochMilli).met)
  }

  test("table-scale latency evaluation is one grouped pass with broadcast targets") {
    val reqs = ((1 to 99).map(i => ("cepea", i.toLong * 4)) ++ // p50 ~200
      Seq(("cepea", 29000L)) ++ // max under 30000 timeout
      (1 to 100).map(i => ("ibge", 5000L + i))) // p50 5050 >> 800 target
      .toDF("source", "duration_ms")
    val out = Sla.evaluateLatencyDf(spark, reqs).collect()
      .map(r => r.getString(0) -> r.getBoolean(r.fieldIndex("met"))).toMap
    assert(out("cepea") && !out("ibge"))
    // single aggregation: no per-source job, targets broadcast
    val plan = Sla.evaluateLatencyDf(spark, reqs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("scorecard merges telemetry, sweep and freshness per source") {
    val now = Instant.parse("1997-01-01T00:00:00Z")
    val findings = Sla.scorecard(
      telemetry = Map("cepea" -> Seq.fill(20)(100L)),
      sweep = Seq(CheckResult("cepea", CheckStatus.Ok, 5L, "", now)),
      freshnessMs = Map("cepea" ->
        (now.toEpochMilli - 3600L * 1000, now.toEpochMilli)))
    assert(findings.map(_.objective) == Seq(
      "availability_uptime_pct", "freshness_hours_behind",
      "latency_max_under_timeout_ms", "latency_p50_ms", "latency_p95_ms",
      "latency_p99_ms"))
    assert(findings.forall(_.met))
  }
}
