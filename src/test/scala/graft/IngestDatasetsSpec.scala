package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import graft.ingest.Ingest
import graft.datasets._
import graft.store.{KvCache, Policies}
import graft.validate.{ColumnSpec, Contract, Fingerprint, Structural}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Ingestion scans, semantic layer, TTL/keys, KV cache, structural
  * drift — the non-oracle operator families, each on fixtures.
  */
class IngestDatasetsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_ing").toString

  test("S3: latin-1 semicolon CSV with BR decimals") {
    val dir = tmp()
    val csv = "produto;valor;uf\nsoja;1.234,56;São Paulo\nmilho;87,25;Paraná\n"
    Files.write(Paths.get(s"$dir/data.csv"), csv.getBytes(Charset.forName("ISO-8859-1")))
    val df = Ingest.csvScanBr(spark, s"$dir/data.csv", brDecimalCols = Seq("valor"))
    val rows = df.orderBy("produto").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[java.math.BigDecimal]("valor").toString == "1234.5600")
    assert(rows(1).getAs[String]("uf") == "São Paulo") // latin-1 decoded
    assert(rows(0).getAs[java.math.BigDecimal]("valor").toString == "87.2500")
  }

  test("S9: BR CSV export round-trips through the engine's own BR reader") {
    val dir = Files.createTempDirectory("graft_brcsv").resolve("out").toString
    val src = Seq(
      ("Sertãozinho", 1234.5678, -0.25),
      ("Não-Me-Toque", 0.0001, 1000000.0),
      ("Açúcar çedilha", -9876.54, 42.0))
      .toDF("municipio", "valor", "variacao")
    Ingest.csvExportBr(src, dir, brDecimalCols = Seq("valor", "variacao"))
    // the raw bytes really are latin-1 semicolon BR format (the export
    // may split across part files — read them all)
    val text = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".csv")).toSeq.sorted
        .map(f => new String(Files.readAllBytes(f), Charset.forName("ISO-8859-1")))
        .mkString("\n")
    }
    assert(text.contains("Sertãozinho;1.234,5678;-0,2500"))
    // column-level inverse: parse ∘ format = identity at 4 dp
    import graft.functions.{GraftFunctions => G}
    val direct = src
      .select(G.parseBrDecimal(G.formatBrDecimal($"valor")).cast("double").as("v"))
      .as[Double].collect().toSet
    assert(direct == Set(1234.5678, 0.0001, -9876.54))
    // reader ∘ writer = identity on values
    val back = Ingest.csvScanBr(spark, dir,
        brDecimalCols = Seq("valor", "variacao"))
      .select($"municipio", $"valor".cast("double"), $"variacao".cast("double"))
      .as[(String, Double, Double)].collect().toSet
    assert(back == Set(
      ("Sertãozinho", 1234.5678, -0.25),
      ("Não-Me-Toque", 0.0001, 1000000.0),
      ("Açúcar çedilha", -9876.54, 42.0)))
  }

  test("row-level provenance: the hidden _metadata column names each row's source file") {
    val dir = Files.createTempDirectory("graft_prov").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/drop1")
    Seq((2L, "b"), (3L, "c")).toDF("k", "v").write.parquet(s"$dir/drop2")
    val rows = spark.read.parquet(s"$dir/drop1", s"$dir/drop2")
      .select($"k", col("_metadata.file_path").as("src"))
      .as[(Long, String)].collect()
    // every row attributes to the drop directory it came from — the
    // per-row lineage MetaInfo tracks at dataset level, free at read time
    assert(rows.filter(_._1 == 1L).forall(_._2.contains("drop1")))
    assert(rows.filter(_._1 >= 2L).forall(_._2.contains("drop2")))
    assert(rows.length == 3)
  }

  test("schema drift across file drops: mergeSchema unifies, missing columns null") {
    val dir = Files.createTempDirectory("graft_drift").toString
    Seq((1L, "soja")).toDF("k", "produto").write.parquet(s"$dir/old")
    Seq((2L, "milho", 50.0)).toDF("k", "produto", "valor").write.parquet(s"$dir/new")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/old", s"$dir/new")
    assert(merged.columns.toSeq == Seq("k", "produto", "valor"))
    val byK = merged.select($"k", $"valor").as[(Long, Option[Double])]
      .collect().toMap
    assert(byK == Map(1L -> None, 2L -> Some(50.0)))
  }

  test("F12: encoding detection chain") {
    val utf8 = "café açúcar".getBytes("UTF-8")
    assert(Ingest.detectEncoding(utf8) == ("UTF-8", "café açúcar"))
    // latin-1 bytes are invalid utf-8 -> fall through to ISO-8859-1
    val latin1 = "café açúcar".getBytes("ISO-8859-1")
    val (cs, text) = Ingest.detectEncoding(latin1)
    assert(cs == "ISO-8859-1" && text == "café açúcar")
    // declared charset wins when it decodes cleanly
    assert(Ingest.detectEncoding(latin1, declared = Some("windows-1252"))._1 ==
      "windows-1252")
    // plain ascii resolves as utf-8 (first in chain)
    assert(Ingest.detectEncoding("plain".getBytes("US-ASCII"))._1 == "UTF-8")
  }

  test("S6: JSON long format with header row 0") {
    val dir = tmp()
    val json =
      """{"D1C":"municipio_codigo","D1N":"municipio","V":"valor"}
        |{"D1C":"3550308","D1N":"São Paulo","V":"123.4"}
        |{"D1C":"4106902","D1N":"Curitiba","V":"56.7"}
        |""".stripMargin
    Files.write(Paths.get(s"$dir/sidra.json"), json.getBytes("UTF-8"))
    val df = Ingest.jsonLongScan(spark, s"$dir/sidra.json")
    assert(df.columns.sorted.toSeq == Seq("municipio", "municipio_codigo", "valor"))
    assert(df.count() == 2)
    assert(df.filter(col("municipio") === "Curitiba").count() == 1)
  }

  test("S1: HTML table extraction picks the hinted table") {
    val html =
      """<html><body>
        |<table id="nav"><tr><td>menu</td></tr></table>
        |<table id="imagenet-indicador" class="grid">
        |<tr><th>Data</th><th>Valor</th><th>Variação</th></tr>
        |<tr><td>10/01/2024</td><td>R$ 130,55</td><td>+0,5%</td></tr>
        |<tr><td>11/01/2024</td><td>R$ 131,20</td><td>-0,2%</td></tr>
        |</table></body></html>""".stripMargin
    val tables = Ingest.htmlTables(html)
    assert(tables.size == 2)
    val best = Ingest.bestTable(tables, "indicador", Seq("data", "valor")).get
    assert(best.id == "imagenet-indicador")
    assert(best.rows.head == Seq("Data", "Valor", "Variação"))
    assert(best.rows.size == 3)
    // end-to-end: grid -> DataFrame -> BR parse
    val df = best.rows.tail.map(r => (r(0), r(1), r(2)))
      .toDF("data_str", "valor_str", "var_str")
      .select(
        graft.functions.GraftFunctions.parseDateMulti(col("data_str")).as("data"),
        graft.functions.GraftFunctions.parseBrDecimal(col("valor_str")).as("valor"),
        graft.functions.GraftFunctions.parseBrDecimal(col("var_str")).as("variacao"))
    val r = df.orderBy("data").collect()
    assert(r(0).getAs[java.math.BigDecimal]("valor").toString == "130.5500")
    assert(r(0).getAs[java.math.BigDecimal]("variacao").toString == "0.5000")
    assert(r(0).getAs[java.sql.Date]("data").toString == "2024-01-10")
  }

  test("S4/R6: header-row discovery + wide-block column groups") {
    val grid = Seq(
      Seq("CONAB — Série Histórica", "", "", "", "", "", ""),
      Seq("", "", "", "", "", "", ""),
      Seq("UF", "Região", "área 21/22", "prod 21/22", "área 22/23", "prod 22/23", ""),
      Seq("MT", "CO", "10", "30", "11", "33", ""),
      Seq("PR", "Sul", "5", "18", "6", "20", ""))
    val h = Ingest.findHeaderRow(grid, Seq("uf", "região"))
    assert(h.contains(2))
    val long = Ingest.wideBlocksToLong(grid.drop(h.get + 1), idCols = 2,
      groupKeys = Seq("2021/22", "2022/23"), groupLabels = Seq("area", "producao"))
    assert(long.contains(Seq("MT", "CO", "2021/22", "area", "10")))
    assert(long.contains(Seq("PR", "Sul", "2022/23", "producao", "20")))
    assert(long.size == 8)
  }

  test("D1-D3: fallback chain, contract gate, snapshot clamp, MetaInfo") {
    def good() = Seq(("soja", "2024-01-10", 130.5), ("soja", "2024-01-11", 131.2))
      .toDF("produto", "data", "valor")
      .withColumn("data", col("data").cast("date"))
    val ds = DatasetDef(
      name = "preco_diario",
      contract = Contract("preco_diario", "1.2.0", Seq(
        ColumnSpec("produto", StringType, nullable = false),
        ColumnSpec("valor", DoubleType, nullable = false, minValue = Some(0.0)))),
      sources = Seq(
        DatasetSource(1, "cepea", () => throw new RuntimeException("http 503")),
        DatasetSource(99, "cache", () => good())))

    val (df, meta) = ds.fetch(snapshot = Some("2024-01-10"))
    assert(df.count() == 1) // snapshot clamps the 01-11 row
    assert(meta.source == "cache")
    assert(meta.records == 1)
    assert(meta.attemptedSources.map(_._1) == Seq("cepea", "cache"))
    assert(meta.attemptedSources.head._2.contains("http 503"))

    // all sources down -> SourceUnavailable with per-source errors
    val down = ds.copy(sources = Seq(
      DatasetSource(1, "a", () => throw new RuntimeException("x"))))
    intercept[SourceUnavailable] { down.fetch() }

    // contract violation -> ContractViolation
    val bad = ds.copy(sources = Seq(DatasetSource(1, "neg",
      () => Seq(("soja", "2024-01-10", -5.0)).toDF("produto", "data", "valor")
        .withColumn("data", col("data").cast("date")))))
    intercept[ContractViolation] { bad.fetch() }

    DatasetRegistry.register(ds)
    assert(DatasetRegistry.get("preco_diario").isDefined)
  }

  test("D4/D5: TTL policies, smart expiry, versioned keys") {
    val noon = LocalDateTime.parse("2024-01-10T12:00:00")
    val evening = LocalDateTime.parse("2024-01-10T19:00:00")
    assert(Policies.smartExpiryTime(noon).toString == "2024-01-10T18:00")
    assert(Policies.smartExpiryTime(evening).toString == "2024-01-11T18:00")
    // cepea_diario: created yesterday morning, now after 18h -> expired
    assert(Policies.isExpired(
      LocalDateTime.parse("2024-01-09T10:00:00"), evening, "cepea_diario"))
    // created after yesterday's publication -> fresh at noon
    assert(!Policies.isExpired(
      LocalDateTime.parse("2024-01-09T19:00:00"), noon, "cepea_diario"))
    // plain TTL
    assert(Policies.isExpired(
      LocalDateTime.parse("2024-01-08T10:00:00"), noon, "conab_safras"))
    assert(Policies.isStaleAcceptable(
      LocalDateTime.parse("2024-01-08T10:00:00"), noon, "conab_safras"))

    val k = Policies.cacheKey("preco_diario",
      Map("produto" -> "soja", "uf" -> null))
    assert(k.startsWith("preco_diario|"))
    assert(Policies.parseCacheKey(k).get("dataset") == "preco_diario")
    assert(Policies.cacheKey("d", Map("a" -> 1, "b" -> 2)) ==
      Policies.cacheKey("d", Map("b" -> 2, "a" -> 1))) // param order canonical
    assert(Policies.isLegacyKey("preco_diario|abc123"))
    assert(!Policies.isLegacyKey(k))
  }

  test("S11: KV cache TTL, staleness, hits, legacy purge, persistence") {
    val kvPath = tmp() + "/kv.parquet"
    val cache = new KvCache(spark, kvPath)
    val t0 = LocalDateTime.parse("2024-01-10T12:00:00")
    cache.put("k|h|v1|sv1", "payload", ttlSeconds = 3600,
      staleMaxSeconds = 7200, now = t0)
    val fresh = cache.get("k|h|v1|sv1", t0.plusMinutes(30)).get
    assert(!fresh.expired && fresh.value == "payload")
    val stale = cache.get("k|h|v1|sv1", t0.plusMinutes(90)).get
    assert(stale.expired && stale.staleAcceptable)
    assert(cache.get("k|h|v1|sv1", t0.plusHours(3)).isEmpty) // past stale window
    cache.put("k|h|v1|sv1", "payload", 3600, 7200, t0)
    cache.get("k|h|v1|sv1", t0)
    cache.get("k|h|v1|sv1", t0)
    assert(cache.hitCount("k|h|v1|sv1") == 2)
    cache.put("legacykey|hash", "old", 3600, 7200, t0)
    assert(cache.purgeLegacyKeys() == 1)
    cache.persist()
    val reloaded = new KvCache(spark, kvPath)
    reloaded.load()
    assert(reloaded.hitCount("k|h|v1|sv1") == 2)
    assert(reloaded.get("k|h|v1|sv1", t0.plusMinutes(5)).exists(_.value == "payload"))
    // driver-scale contract: a table past the entry bound refuses to
    // load (metadata-sized by construction — past that it's a fact
    // table's job, not a driver KV map)
    val guarded = new KvCache(spark, kvPath, maxEntries = 0L)
    val err = intercept[IllegalArgumentException](guarded.load())
    assert(err.getMessage.contains("no longer driver-scale"))
  }

  test("V6: structural drift levels") {
    val base = Fingerprint("abc", Seq("grid", "data"), Seq("tbl-main"),
      Seq(Seq("Data", "Valor", "Variação")), Map("table" -> 2, "tr" -> 40))
    assert(Structural.validate(base, base).level == "high")

    val minor = base.copy(elementCounts = Map("table" -> 2, "tr" -> 90))
    val rMinor = Structural.validate(minor, base)
    assert(rMinor.passed && rMinor.similarity < 1.0)

    val major = base.copy(structureHash = "zzz",
      tableHeaders = Seq(Seq("Col1", "Col2")), keyIds = Seq("other"))
    val rMajor = Structural.validate(major, base)
    assert(!rMajor.passed)
  }
}
