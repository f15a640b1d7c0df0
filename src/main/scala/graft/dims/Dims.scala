package graft.dims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}

/** Dimension tables + normalization lookups (SURVEY §2.3 J6, §2.7
  * F4/F5): the 27 Brazilian UFs with region and IBGE code (data per
  * reference `normalize/regions.py:39-75`) and the crop-alias
  * canonicalization table (representative subset of
  * `normalize/crops.py:11-174` + `aliases.py:3-52`; same accent-
  * insensitive lookup + underscore fallback semantics).
  *
  * Both dims are bounded (27 rows / ~100 aliases) — the one join class
  * that is ALWAYS explicitly broadcast: at 100 TB the fact side never
  * shuffles for a dim lookup.
  */
object Dims {

  /** (sigla, nome, regiao, ibge) — all 27 UFs. */
  val ufs: Seq[(String, String, String, Int)] = Seq(
    ("AC", "Acre", "Norte", 12), ("AL", "Alagoas", "Nordeste", 27),
    ("AP", "Amapá", "Norte", 16), ("AM", "Amazonas", "Norte", 13),
    ("BA", "Bahia", "Nordeste", 29), ("CE", "Ceará", "Nordeste", 23),
    ("DF", "Distrito Federal", "Centro-Oeste", 53),
    ("ES", "Espírito Santo", "Sudeste", 32), ("GO", "Goiás", "Centro-Oeste", 52),
    ("MA", "Maranhão", "Nordeste", 21), ("MT", "Mato Grosso", "Centro-Oeste", 51),
    ("MS", "Mato Grosso do Sul", "Centro-Oeste", 50),
    ("MG", "Minas Gerais", "Sudeste", 31), ("PA", "Pará", "Norte", 15),
    ("PB", "Paraíba", "Nordeste", 25), ("PR", "Paraná", "Sul", 41),
    ("PE", "Pernambuco", "Nordeste", 26), ("PI", "Piauí", "Nordeste", 22),
    ("RJ", "Rio de Janeiro", "Sudeste", 33),
    ("RN", "Rio Grande do Norte", "Nordeste", 24),
    ("RS", "Rio Grande do Sul", "Sul", 43), ("RO", "Rondônia", "Norte", 11),
    ("RR", "Roraima", "Norte", 14), ("SC", "Santa Catarina", "Sul", 42),
    ("SP", "São Paulo", "Sudeste", 35), ("SE", "Sergipe", "Nordeste", 28),
    ("TO", "Tocantins", "Norte", 17))

  def ufDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ufs.toDF("sigla", "nome", "regiao", "ibge")
  }

  /** Lookup keys for UF resolution: lowercase sigla and accent-stripped
    * lowercase name, both mapping to the sigla (reference
    * `NOMES_PARA_UF`, `regions.py:84-101`).
    */
  def ufLookup(spark: SparkSession): DataFrame = {
    val d = ufDim(spark)
    d.select(lower(col("sigla")).as("k"), col("sigla"))
      .unionByName(d.select(G.stripAccents(lower(col("nome"))).as("k"), col("sigla")))
  }

  /** alias -> canonical crop (accent-stripped lowercase keys). */
  val cropAliases: Seq[(String, String)] = Seq(
    "soja" -> "soja", "soja em grao" -> "soja", "soja_grao" -> "soja",
    "soybean" -> "soja", "soybeans" -> "soja", "soy" -> "soja",
    "milho" -> "milho", "milho total" -> "milho", "milho_total" -> "milho",
    "corn" -> "milho", "maize" -> "milho",
    "milho 1a safra" -> "milho_1", "milho 1ª safra" -> "milho_1", "milho_1" -> "milho_1",
    "milho 2a safra" -> "milho_2", "milho 2ª safra" -> "milho_2", "milho_2" -> "milho_2",
    "cafe" -> "cafe", "coffee" -> "cafe",
    "cafe arabica" -> "cafe_arabica", "cafe_arabica" -> "cafe_arabica",
    "arabica" -> "cafe_arabica",
    "cafe robusta" -> "cafe_robusta", "conilon" -> "cafe_robusta",
    "cafe conilon" -> "cafe_robusta",
    "algodao" -> "algodao", "cotton" -> "algodao",
    "algodao herbaceo" -> "algodao", "algodao_herbaceo" -> "algodao",
    "algodao em pluma" -> "algodao_pluma", "algodao_pluma" -> "algodao_pluma",
    "trigo" -> "trigo", "wheat" -> "trigo",
    "arroz" -> "arroz", "rice" -> "arroz", "arroz casca" -> "arroz",
    "arroz em casca" -> "arroz",
    "feijao" -> "feijao", "bean" -> "feijao", "beans" -> "feijao",
    "feijao total" -> "feijao",
    "feijao 1a safra" -> "feijao_1", "feijao_1" -> "feijao_1",
    "feijao 2a safra" -> "feijao_2", "feijao_2" -> "feijao_2",
    "boi" -> "boi", "boi gordo" -> "boi", "boi_gordo" -> "boi",
    "cattle" -> "boi", "beef" -> "boi",
    "acucar" -> "acucar", "sugar" -> "acucar",
    "acucar cristal" -> "acucar_cristal", "acucar_cristal" -> "acucar_cristal",
    "acucar refinado" -> "acucar_refinado",
    "cana" -> "cana", "cana de acucar" -> "cana", "cana_de_acucar" -> "cana",
    "sugarcane" -> "cana",
    "etanol hidratado" -> "etanol_hidratado", "etanol" -> "etanol_hidratado",
    "ethanol" -> "etanol_hidratado", "etanol anidro" -> "etanol_anidro",
    "frango" -> "frango_congelado", "frango congelado" -> "frango_congelado",
    "chicken" -> "frango_congelado", "frango resfriado" -> "frango_resfriado",
    "suino" -> "suino", "porco" -> "suino", "pork" -> "suino")

  /** F4 — canonical crop: accent-insensitive alias lookup with the
    * reference's fallback `replace(" ", "_")` on the normalized input
    * (`normalize/crops.py:177-186`). Pure expression (broadcast-map
    * semantics without a join).
    */
  def normalizeCrop(c: Column): Column = {
    val key = G.stripAccents(lower(trim(c)))
    val m = typedlit(cropAliases.toMap)
    coalesce(element_at(m, key), regexp_replace(key, " ", "_"))
  }

  /** (codigo_ibge, nome, uf) — the FULL 5,571-row IBGE município table
    * (public facts; same data the reference embeds as
    * `_municipios_ibge.json`, lookup semantics per
    * `normalize/municipalities.py:29-89`). Shipped as a columnar TSV
    * resource in código order; parsed once on the driver. Bounded
    * (~130 KB) → always broadcast; at 100 TB the fact side never
    * shuffles for this lookup.
    */
  lazy val municipios: Seq[(Int, String, String)] = {
    val in = getClass.getResourceAsStream("/graft/municipios_ibge.tsv")
    require(in != null, "municipios_ibge.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val Array(code, nome, uf) = line.split('\t')
      (code.toInt, nome, uf)
    }.toVector
    finally src.close()
  }

  def municipioDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    municipios.toDF("codigo_ibge", "nome", "uf")
  }

  /** F6 lookup keys: accent-stripped lowercase name + UF → IBGE code. */
  def municipioLookup(spark: SparkSession): DataFrame =
    municipioDim(spark).select(
      G.stripAccents(lower(col("nome"))).as("k"), col("uf"), col("codigo_ibge"),
      col("nome"))

  /** F6 — "Município - UF" splitter (reference `regions.py:152-161`):
    * returns (municipio_raw, uf_raw) string columns; empty on no match.
    */
  def splitMunicipioUf(c: Column): (Column, Column) = {
    val pat = "^(.+?)\\s*[-/]\\s*([A-Za-z]{2})$"
    (regexp_extract(trim(c), pat, 1), upper(regexp_extract(trim(c), pat, 2)))
  }
}
