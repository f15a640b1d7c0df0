package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.Snapshots
import graft.ingest.{Resilience, Telemetry}
import graft.dims.Dims
import graft.datasets.ErrorTaxonomy

/** Snapshots, retry/rate-limit, telemetry, município splitter, error
  * taxonomy.
  */
class StoreResilienceSpec extends SparkSuite {
  import spark.implicits._

  test("S10: snapshot create/list/load with manifest") {
    val base = Files.createTempDirectory("graft_snap").toString
    val prices = Seq(("soja", 130.5), ("milho", 62.2)).toDF("produto", "valor")
    val safras = Seq(("soja", "2024/25", 165000.0)).toDF("produto", "safra", "producao")
    val entries = Snapshots.create(spark, base, "2024-01-15",
      Map("cepea/indicador" -> prices, "conab/safras" -> safras))
    assert(entries.map(e => (e.source, e.dataset, e.rows)).toSet ==
      Set(("cepea", "indicador", 2L), ("conab", "safras", 1L)))
    assert(Snapshots.list(base) == Seq("2024-01-15"))
    val back = Snapshots.load(spark, base, "2024-01-15", "cepea", "indicador")
    assert(back.count() == 2)
    assert(Snapshots.manifest(base, "2024-01-15").contains("\"rows\": 2"))
    intercept[IllegalArgumentException] {
      Snapshots.create(spark, base, "2024-01-15", Map.empty)
    }
  }

  test("D7: backoff, retry-after, retriable classification") {
    assert(Resilience.backoffDelay(0) == 1.0)
    assert(Resilience.backoffDelay(3) == 8.0)
    assert(Resilience.backoffDelay(10) == 30.0) // capped
    assert(Resilience.backoffDelay(0, retryAfter = Some(12.0)) == 12.0)
    assert(Resilience.backoffDelay(0, retryAfter = Some(120.0)) == 30.0)

    var calls = 0
    val slept = scala.collection.mutable.ListBuffer.empty[Double]
    val r = Resilience.retry[String](
      () => { calls += 1
        if (calls < 3) throw new java.io.IOException("flaky") else "ok" },
      maxAttempts = 5, sleeper = slept.+=(_))
    assert(r.isSuccess && r.get == "ok" && calls == 3)
    assert(slept.toSeq == Seq(1.0, 2.0))

    // non-retriable propagates immediately
    var calls2 = 0
    val r2 = Resilience.retry[String](
      () => { calls2 += 1; throw new IllegalStateException("bad") },
      maxAttempts = 5, sleeper = _ => ())
    assert(r2.isFailure && calls2 == 1)
  }

  test("D7: rate limiter enforces min delay per source") {
    val rl = new Resilience.RateLimiter(1000)
    assert(rl.waitTimeMs("cepea", 0L) == 0L)
    assert(rl.waitTimeMs("cepea", 300L) == 700L)
    assert(rl.waitTimeMs("conab", 300L) == 0L) // independent source
    assert(rl.waitTimeMs("cepea", 2500L) == 0L)
  }

  test("D8: telemetry accumulates per (source, kind)") {
    val t = new Telemetry
    t.record("cepea", "fetch", 120)
    t.record("cepea", "fetch", 80, error = true)
    t.record("cepea", "parse", 15)
    val s = t.summary("cepea", "fetch").get
    assert(s.events == 2 && s.errors == 1 && s.totalDurationMs == 200)
    assert(t.summary("cepea", "parse").get.events == 1)
    assert(t.summary("ibge", "fetch").isEmpty)
  }

  test("D8: data metrics ride the job via observe (no second scan)") {
    import graft.ingest.DataMetrics
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(5.0)))
      .toDF("k", "v")
    val (instrumented, obs) = DataMetrics.observed(df, "ingest_stats", Map(
      "n_rows" -> count(lit(1)),
      "n_null_v" -> sum(when(col("v").isNull, 1L).otherwise(0L)),
      "sum_v" -> sum(col("v"))))
    // the downstream pipeline runs exactly once; metrics fold alongside
    assert(instrumented.filter(col("k") > 1).count() == 2)
    val m = obs.get
    assert(m("n_rows") == 3L && m("n_null_v") == 1L && m("sum_v") == 7.0)
  }

  test("F6: municipio splitter + dim lookup") {
    val (m, u) = Dims.splitMunicipioUf(col("raw"))
    val out = Seq("Sertãozinho - SP", "Lucas do Rio Verde/MT", "no separator")
      .toDF("raw").select(m.as("muni"), u.as("uf"))
      .as[(String, String)].collect().toSeq
    assert(out(0) == ("Sertãozinho", "SP"))
    assert(out(1) == ("Lucas do Rio Verde", "MT"))
    assert(out(2) == ("", ""))
    assert(Dims.municipios.map(_._1).distinct.size == Dims.municipios.size)
  }

  test("F6: full 5,571-row IBGE município dim — non-capital lookups resolve") {
    assert(Dims.municipios.size == 5571)
    import org.apache.spark.unsafe.types.UTF8String
    def strip(s: String): String =
      graft.functions.TextOps.stripAccents(UTF8String.fromString(s)).toString
    // (accent-stripped-lower name, uf) is a unique lookup key over the full table
    assert(Dims.municipios
      .map { case (_, n, u) => (strip(n.toLowerCase), u) }.distinct.size == 5571)
    val lk = Dims.municipioLookup(spark)
    def ibge(name: String, uf: String): Long =
      lk.filter(col("k") === strip(name.toLowerCase) && col("uf") === uf)
        .select(col("codigo_ibge")).as[Int].head().toLong
    assert(ibge("Não-Me-Toque", "RS") == 4312658L)   // non-capital, accented + hyphens
    assert(ibge("Sorriso", "MT") == 5107925L)        // non-capital ag hub
    assert(ibge("Olho d'Água das Cunhãs", "MA") == 2107407L) // apostrophe name
    assert(ibge("Santa Rosa", "RS") == 4317202L)
  }

  test("D1: error taxonomy classification") {
    assert(ErrorTaxonomy.classify(new java.io.IOException("x")) == "network")
    assert(ErrorTaxonomy.classify(new NumberFormatException("x")) == "parse")
    assert(ErrorTaxonomy.classify(
      graft.datasets.ContractViolation("d", Seq("v"))) == "contract")
    assert(ErrorTaxonomy.classify(new RuntimeException("x")) == "unexpected")
  }
}
