package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}
import graft.ingest.Ingest
import graft.store.Store

/** Golden end-to-end pipelines for the FIXTURES.md B1-B8 families,
  * mirroring the reference harness assertions
  * (`tests/test_golden.py:100-198`): row count, first/last row values,
  * and a canonical content checksum.
  */
class GoldenSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_golden").toString

  /** test_golden-style assertion: count, first row, last row, stable
    * canonical checksum.
    */
  private def assertGolden(df: DataFrame, orderCol: String, count: Long,
      first: Map[String, Any], last: Map[String, Any],
      checksumCols: Seq[String]): String = {
    val sorted = df.orderBy(col(orderCol)).collect()
    assert(sorted.length == count, s"count ${sorted.length} != $count")
    def check(row: Row, exp: Map[String, Any], which: String): Unit =
      exp.foreach { case (k, v) =>
        val actual = row.getAs[Any](k)
        assert(String.valueOf(actual) == String.valueOf(v),
          s"$which.$k: got $actual, expected $v")
      }
    check(sorted.head, first, "first")
    check(sorted.last, last, "last")
    val sum = Store.contentHash(df, checksumCols).collect()(0).getString(1)
    // checksum must be deterministic across runs
    assert(sum == Store.contentHash(df, checksumCols).collect()(0).getString(1))
    sum
  }

  test("B1: CEPEA HTML -> indicadores rows (parse, contract, anomalies)") {
    val html =
      """<table id="imagenet-indicador">
        |<tr><th>Data</th><th>Valor (R$/sc 60kg)</th><th>Variação</th></tr>
        |<tr><td>02/01/2024</td><td>123,48</td><td>+0,3%</td></tr>
        |<tr><td>03/01/2024</td><td>124,10</td><td>+0,5%</td></tr>
        |<tr><td>04/01/2024</td><td>145,50</td><td>+17,2%</td></tr>
        |<tr><td>05/01/2024</td><td>124,58</td><td>-14,4%</td></tr>
        |</table>""".stripMargin
    val t = Ingest.bestTable(Ingest.htmlTables(html), "indicador",
      Seq("data", "valor")).get
    val df = t.rows.tail.map(r => (r(0), r(1), r(2)))
      .toDF("data_s", "valor_s", "var_s")
      .select(
        G.parseDateMulti(col("data_s")).as("data"),
        lit("soja").as("produto"),
        G.parseBrDecimal(col("valor_s")).as("valor"),
        lit("BRL/sc60kg").as("unidade"),
        G.parseBrDecimal(col("var_s")).as("variacao_percentual"))
    val sum = assertGolden(df, "data", 4,
      first = Map("valor" -> "123.4800", "variacao_percentual" -> "0.3000"),
      last = Map("data" -> "2024-01-05", "valor" -> "124.5800"),
      checksumCols = Seq("data", "produto", "valor"))
    assert(sum.length == 64)
    // sanity (B10 rules on B1 data): the 17.2% day breaches max change 15
    val flagged = graft.validate.Sanity.flagAnomalies(df,
      Map("soja" -> graft.validate.SanityRule(30, 300, 15)),
      col("produto"), col("valor").cast("double"),
      Seq(col("produto")), Seq(col("data")))
    assert(flagged.select("anomalies").as[String].collect().toSet ==
      Set("daily_change"))
  }

  test("B2: CONAB wide-block grid -> safra long + cross-column invariant") {
    val grid = Seq(
      Seq("Safras", "", "", "", "", "", ""),
      Seq("UF", "Região", "área 23/24", "produção 23/24", "área 24/25", "produção 24/25"),
      Seq("MT", "CO", "12.000,5", "43.000,0", "12.500,0", "45.200,5"),
      Seq("PR", "Sul", "5.700,0", "21.000,0", "5.800,0", "22.100,0"))
    val h = Ingest.findHeaderRow(grid, Seq("uf", "região")).get
    val long = Ingest.wideBlocksToLong(grid.drop(h + 1), 2,
      Seq("2023/24", "2024/25"), Seq("area_plantada", "producao"))
    val df = long.map { case Seq(uf, reg, safra, metric, v) => (uf, reg, safra, metric, v) }
      .toDF("uf", "regiao", "safra", "metric", "v_raw")
      .withColumn("valor", G.parseBrDecimal(col("v_raw")))
      .groupBy("uf", "safra").pivot("metric", Seq("area_plantada", "producao"))
      .agg(first(col("valor")))
    assert(df.count() == 4)
    val mt = df.filter(col("uf") === "MT" && col("safra") === "2024/25").collect()(0)
    assert(mt.getAs[java.math.BigDecimal]("area_plantada").toString == "12500.0000")
    // V4 cross-column invariant frame: producao/area = produtividade sane
    val bad = df.filter(col("producao") < col("area_plantada")).count()
    assert(bad == 0)
  }

  test("B3: SIDRA JSON long -> pivoted wide PAM frame") {
    val dir = tmp()
    val json =
      """{"D1N":"localidade","D2N":"ano","D3N":"variavel","V":"valor"}
        |{"D1N":"Sorriso","D2N":"2023","D3N":"area_plantada","V":"700000"}
        |{"D1N":"Sorriso","D2N":"2023","D3N":"producao","V":"2500000"}
        |{"D1N":"Rio Verde","D2N":"2023","D3N":"area_plantada","V":"400000"}
        |{"D1N":"Rio Verde","D2N":"2023","D3N":"producao","V":"1400000"}
        |""".stripMargin
    Files.write(Paths.get(s"$dir/sidra.json"), json.getBytes("UTF-8"))
    val wide = Ingest.jsonLongScan(spark, s"$dir/sidra.json")
      .groupBy(col("localidade"), col("ano").cast("int").as("ano"))
      .pivot("variavel", Seq("area_plantada", "producao"))
      .agg(first(col("valor").cast("double")))
      .withColumn("produto", lit("soja"))
    assertGolden(wide, "localidade", 2,
      first = Map("localidade" -> "Rio Verde", "area_plantada" -> 400000.0),
      last = Map("localidade" -> "Sorriso", "producao" -> 2500000.0),
      checksumCols = Seq("localidade", "ano"))
  }

  test("B4: trade mirror with suffixed measures, diffs and guarded ratios") {
    val reporter = Seq(("202401", "1201", 100.0, 50.0), ("202402", "1201", 0.0, 0.0))
      .toDF("periodo", "hs_code", "peso_kg", "valor_fob")
    val partner = Seq(("202401", "1201", 95.0, 48.0), ("202403", "1005", 20.0, 9.0))
      .toDF("periodo", "hs_code", "peso_kg", "valor_fob")
    val mirror = reporter.select(col("periodo"), col("hs_code"),
        col("peso_kg").as("peso_kg_reporter"), col("valor_fob").as("valor_fob_reporter"))
      .join(partner.select(col("periodo"), col("hs_code"),
        col("peso_kg").as("peso_kg_partner"), col("valor_fob").as("valor_fob_partner")),
        Seq("periodo", "hs_code"), "full_outer")
      .withColumn("diff_peso_kg", col("peso_kg_reporter") - col("peso_kg_partner"))
      .withColumn("ratio_valor",
        when(col("valor_fob_partner").isNull || col("valor_fob_partner") === 0,
          lit(null)).otherwise(col("valor_fob_reporter") / col("valor_fob_partner")))
      .withColumn("ano", substring(col("periodo"), 1, 4).cast("int"))
      .withColumn("mes", substring(col("periodo"), 5, 2).cast("int"))
    assert(mirror.count() == 3)
    val m1 = mirror.filter(col("periodo") === "202401").collect()(0)
    assert(m1.getAs[Double]("diff_peso_kg") == 5.0)
    assert(math.abs(m1.getAs[Double]("ratio_valor") - 50.0 / 48.0) < 1e-12)
    assert(mirror.filter(col("periodo") === "202403")
      .collect()(0).isNullAt(mirror.columns.indexOf("peso_kg_reporter")))
  }

  test("B5: INMET sentinel scrub + daily and monthly aggs") {
    val obs = Seq(
      ("2024-01-10 10:00:00", "A001", "MT", 31.5, 0.0),
      ("2024-01-10 16:00:00", "A001", "MT", 35.0, 2.5),
      ("2024-01-10 12:00:00", "A002", "MT", -9999.0, -9999.0),
      ("2024-01-11 12:00:00", "A001", "MT", 30.0, 1.0))
      .toDF("ts", "estacao", "uf", "temperatura", "precipitacao_mm")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("temperatura", when(col("temperatura") === -9999.0, lit(null))
        .otherwise(col("temperatura")))
      .withColumn("precipitacao_mm", when(col("precipitacao_mm") === -9999.0, lit(null))
        .otherwise(col("precipitacao_mm")))
    val daily = obs.groupBy(col("ts").cast("date").as("data"), col("estacao"), col("uf"))
      .agg(avg("temperatura").as("temp_media"), max("temperatura").as("temp_max"),
        sum("precipitacao_mm").as("precip_total"))
    val d = daily.filter(col("estacao") === "A001" && col("data") === "2024-01-10")
      .collect()(0)
    assert(d.getAs[Double]("temp_media") == 33.25 && d.getAs[Double]("precip_total") == 2.5)
    // all-sentinel station day aggregates to nulls, not zeros
    val s = daily.filter(col("estacao") === "A002").collect()(0)
    assert(s.isNullAt(daily.columns.indexOf("temp_media")))
    val monthly = obs.groupBy(date_trunc("month", col("ts")).as("mes"), col("uf"))
      .agg(countDistinct("estacao").as("num_estacoes"))
    assert(monthly.collect()(0).getAs[Long]("num_estacoes") == 2)
  }

  test("B6: MapBiomas year-column melt with null-area drop") {
    val wide = Seq(
      ("Amazônia", "PA", 3L, "Forest", Some(100.5), None),
      ("Cerrado", "MT", 15L, "Pasture", Some(50.0), Some(48.2)))
      .toDF("bioma", "estado", "classe_id", "classe", "2022", "2023")
    val long = wide.select(col("bioma"), col("estado"), col("classe_id"), col("classe"),
        expr("stack(2, '2022', `2022`, '2023', `2023`) AS (ano, area_ha)"))
      .filter(col("area_ha").isNotNull)
      .withColumn("ano", col("ano").cast("int"))
    assert(long.count() == 3) // the null 2023 Amazônia row dropped
    assert(long.filter(col("bioma") === "Amazônia").count() == 1)
  }

  test("B7: queimadas CSV with latin-1 fallback and derived columns") {
    val dir = tmp()
    val csv = "id;lat;lon;data_hora_gmt;estado;bioma\n" +
      "f1;-12,5;-55,7;2024-01-10 14:35:00;MATO GROSSO;Cerrado\n" +
      "f2;-3,2;-60,0;2024-01-10 15:02:00;AMAZONAS;Amazônia\n"
    Files.write(Paths.get(s"$dir/focos.csv"),
      csv.getBytes(Charset.forName("ISO-8859-1")))
    val df = Ingest.csvScanBr(spark, s"$dir/focos.csv",
        brDecimalCols = Seq("lat", "lon"))
      .withColumn("data_hora_gmt", col("data_hora_gmt").cast("timestamp"))
      .withColumn("data", col("data_hora_gmt").cast("date"))
      .withColumn("hora_gmt", date_format(col("data_hora_gmt"), "HH:mm"))
      .join(broadcast(graft.dims.Dims.ufDim(spark)),
        G.stripAccents(lower(col("estado"))) ===
          G.stripAccents(lower(col("nome"))), "left")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("sigla") == "MT")
    assert(rows(0).getAs[String]("hora_gmt") == "14:35")
    assert(rows(0).getAs[java.math.BigDecimal]("lat").toString == "-12.5000")
    // lat/lon contract bounds (B7): all rows inside Brazil's box
    assert(df.filter(col("lat") < -35 || col("lat") > 7 ||
      col("lon") < -75 || col("lon") > -30).count() == 0)
  }

  test("B8: ANTAQ 3-table join with dedup'd dim and BR quantities") {
    val atracacao = Seq((1L, "Santos", "SP", 2024, 1), (2L, "Paranaguá", "PR", 2024, 1))
      .toDF("IDAtracacao", "porto", "SGUF", "ano", "mes")
    val carga = Seq((1L, "SOJ", "1.500,5"), (1L, "MIL", "200,0"), (2L, "SOJ", "900,25"))
      .toDF("IDAtracacao", "CDMercadoria", "QTCarga")
    val mercadoria = Seq(("SOJ", "Soja"), ("SOJ", "Soja"), ("MIL", "Milho"))
      .toDF("CDMercadoria", "nomenclatura")
    val joined = carga
      .join(atracacao, Seq("IDAtracacao"), "left")
      .join(broadcast(mercadoria.dropDuplicates("CDMercadoria")),
        Seq("CDMercadoria"), "left")
      .withColumn("qt_carga", G.parseBrDecimal(col("QTCarga")))
      .select(col("ano"), col("mes"), col("SGUF").as("uf"), col("porto"),
        col("nomenclatura"), col("qt_carga"))
      .orderBy("uf", "porto", "nomenclatura")
    val rows = joined.collect()
    assert(rows.length == 3) // dim dedup keeps the join 1:n
    assert(rows.map(_.getAs[java.math.BigDecimal]("qt_carga").toString).toSeq ==
      Seq("900.2500", "200.0000", "1500.5000"))
  }
}
