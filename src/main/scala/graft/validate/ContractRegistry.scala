package graft.validate

import org.apache.spark.sql.types._

/** Contract registry (reference `contracts/__init__.py:248-269` with 30
  * registered contracts; the families here mirror the FIXTURES.md
  * B1-B8 schemas). Contracts are data — adding a source means adding a
  * Contract here and a DatasetDef in the registry.
  */
object ContractRegistry {

  val cepeaIndicador: Contract = Contract("cepea.indicador", "1.0.0", Seq(
    ColumnSpec("data", DateType, nullable = false),
    ColumnSpec("produto", StringType, nullable = false),
    ColumnSpec("praca", StringType),
    ColumnSpec("valor", DecimalType(18, 4), nullable = false, minValue = Some(0.0)),
    ColumnSpec("unidade", StringType, nullable = false),
    ColumnSpec("variacao_percentual", DecimalType(18, 4))),
    primaryKey = Seq("data", "produto"))

  val conabSafra: Contract = Contract("conab.safra", "1.0.0", Seq(
    ColumnSpec("produto", StringType, nullable = false),
    ColumnSpec("safra", StringType, nullable = false),
    ColumnSpec("uf", StringType),
    ColumnSpec("area_plantada", DecimalType(18, 4), minValue = Some(0.0)),
    ColumnSpec("producao", DecimalType(18, 4), minValue = Some(0.0)),
    ColumnSpec("produtividade", DecimalType(18, 4), minValue = Some(0.0)),
    ColumnSpec("levantamento", IntegerType, minValue = Some(1), maxValue = Some(12))),
    primaryKey = Seq("produto", "safra", "uf", "levantamento"))

  val ibgePam: Contract = Contract("ibge.pam", "1.0.0", Seq(
    ColumnSpec("localidade", StringType, nullable = false),
    ColumnSpec("ano", IntegerType, nullable = false,
      minValue = Some(1974), maxValue = Some(2100)),
    ColumnSpec("area_plantada", DoubleType, minValue = Some(0.0)),
    ColumnSpec("area_colhida", DoubleType, minValue = Some(0.0)),
    ColumnSpec("producao", DoubleType, minValue = Some(0.0)),
    ColumnSpec("rendimento", DoubleType, minValue = Some(0.0)),
    ColumnSpec("produto", StringType, nullable = false)),
    primaryKey = Seq("localidade", "ano", "produto"))

  val tradeMirror: Contract = Contract("trade_mirror", "1.0.0", Seq(
    ColumnSpec("periodo", StringType, nullable = false),
    ColumnSpec("hs_code", StringType, nullable = false),
    ColumnSpec("peso_kg_reporter", DoubleType, minValue = Some(0.0)),
    ColumnSpec("peso_kg_partner", DoubleType, minValue = Some(0.0)),
    ColumnSpec("valor_fob_reporter", DoubleType, minValue = Some(0.0)),
    ColumnSpec("valor_fob_partner", DoubleType, minValue = Some(0.0))),
    primaryKey = Seq("periodo", "hs_code"))

  val inmetDaily: Contract = Contract("inmet.daily", "1.0.0", Seq(
    ColumnSpec("data", DateType, nullable = false),
    ColumnSpec("estacao", StringType, nullable = false),
    ColumnSpec("uf", StringType),
    ColumnSpec("temp_media", DoubleType, minValue = Some(-45.0), maxValue = Some(50.0)),
    ColumnSpec("precip_total", DoubleType, minValue = Some(0.0))),
    primaryKey = Seq("data", "estacao"))

  val queimadasFocos: Contract = Contract("queimadas.focos", "1.0.0", Seq(
    ColumnSpec("id", StringType, nullable = false),
    ColumnSpec("lat", DecimalType(18, 4), nullable = false,
      minValue = Some(-35.0), maxValue = Some(7.0)),
    ColumnSpec("lon", DecimalType(18, 4), nullable = false,
      minValue = Some(-75.0), maxValue = Some(-30.0)),
    ColumnSpec("data", DateType, nullable = false),
    ColumnSpec("uf", StringType)),
    primaryKey = Seq("id"))

  val all: Map[String, Contract] = Seq(cepeaIndicador, conabSafra, ibgePam,
    tradeMirror, inmetDaily, queimadasFocos).map(c => c.name -> c).toMap

  def get(name: String): Option[Contract] = all.get(name)
}
