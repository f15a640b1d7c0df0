package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._
import graft.dims.Dims
import graft.functions.{GraftFunctions => G}

/** Dimension-lookup family (J6, F4/F5): UF resolution (sigla or
  * accented/unaccented name → sigla/region/IBGE code) via broadcast
  * lookup join, crop-alias canonicalization as a pure map expression,
  * and a fact-to-dim region rollup. The single source of truth for both
  * the Spark dim and the SQL oracle is [[graft.dims.Dims]].
  */
object DimOps {

  private def siglaArr = Dims.ufs.map(_._1)
  private def nomeArr = Dims.ufs.map(_._2)
  private def sqlList(xs: Seq[String]) = s"['${xs.mkString("','")}']"
  private def ufValues = Dims.ufs
    .map { case (s, n, r, i) => s"('$s','$n','$r',$i)" }.mkString(", ")

  /** F5 — normalize UF from mixed spellings (lowercase sigla, accented
    * name, stripped lowercase name) to the canonical dim row.
    */
  val g01 = Q("g01_uf_lookup",
    (s, dir) => {
      val idx = pmod(col("n_nationkey"), lit(Dims.ufs.size)).cast("int")
      val raw = when(pmod(col("n_nationkey"), lit(3)) === 0,
          lower(element_at(array(siglaArr.map(lit): _*), idx + 1)))
        .when(pmod(col("n_nationkey"), lit(3)) === 1,
          element_at(array(nomeArr.map(lit): _*), idx + 1))
        .otherwise(G.stripAccents(lower(element_at(array(nomeArr.map(lit): _*), idx + 1))))
      val inputs = load(s, dir, "nation").select(col("n_nationkey"), raw.as("raw"))
      val lk = broadcast(Dims.ufLookup(s))
      val dim = broadcast(Dims.ufDim(s))
      inputs
        .join(lk, G.stripAccents(lower(trim(col("raw")))) === lk("k"))
        .join(dim, Seq("sigla"))
        .select(col("n_nationkey"), col("raw"), col("sigla"), col("nome"),
          col("regiao"), col("ibge"))
        .orderBy(col("n_nationkey"))
    },
    Some(s"""
      WITH uf(sigla, nome, regiao, ibge) AS (VALUES $ufValues),
      inputs AS (
        SELECT n_nationkey,
          CASE WHEN n_nationkey % 3 = 0 THEN lower((${sqlList(siglaArr)})[idx + 1])
               WHEN n_nationkey % 3 = 1 THEN (${sqlList(nomeArr)})[idx + 1]
               ELSE strip_accents(lower((${sqlList(nomeArr)})[idx + 1])) END AS raw
        FROM (SELECT n_nationkey, CAST(n_nationkey % ${Dims.ufs.size} AS INT) AS idx
              FROM nation) t),
      lk AS (SELECT lower(sigla) AS k, sigla FROM uf
             UNION ALL SELECT strip_accents(lower(nome)), sigla FROM uf)
      SELECT i.n_nationkey, i.raw, u.sigla, u.nome, u.regiao, u.ibge
      FROM inputs i
      JOIN lk ON strip_accents(lower(trim(i.raw))) = lk.k
      JOIN uf u ON lk.sigla = u.sigla
      ORDER BY i.n_nationkey"""))

  private val rawCrops = Seq("Soja em Grão", "CORN", "café arábica",
    "algodão herbáceo", "Boi Gordo", "TRIGO", "feijão 2ª safra",
    "açúcar cristal", "cana de açúcar", "ethanol",
    "produto desconhecido xyz", "Milho 2ª Safra")
  private val expectedCrops = Seq("soja", "milho", "cafe_arabica", "algodao",
    "boi", "trigo", "feijao_2", "acucar_cristal", "cana", "etanol_hidratado",
    "produto_desconhecido_xyz", "milho_2")

  /** F4 — crop canonicalization: accent-insensitive alias map with the
    * underscore fallback; expected values stated literally in the oracle
    * (NFKD also folds 'ª'→'a', which plain accent-stripping would not).
    */
  val g02 = Q("g02_crop_normalize",
    (s, dir) => {
      val idx = pmod(col("p_partkey"), lit(rawCrops.size)).cast("int")
      load(s, dir, "part")
        .select(col("p_partkey"),
          element_at(array(rawCrops.map(lit): _*), idx + 1).as("raw"),
          Dims.normalizeCrop(
            element_at(array(rawCrops.map(lit): _*), idx + 1)).as("produto"))
        .orderBy(col("p_partkey"))
    },
    Some(s"""
      SELECT p_partkey,
        (${sqlList(rawCrops)})[CAST(p_partkey % ${rawCrops.size} AS INT) + 1] AS raw,
        (${sqlList(expectedCrops)})[CAST(p_partkey % ${rawCrops.size} AS INT) + 1] AS produto
      FROM part ORDER BY p_partkey"""))

  /** J6/A3 — fact ⋈ broadcast dim, rolled up by region: the dim join
    * every normalized output column flows through in the reference.
    */
  val g03 = Q("g03_region_rollup",
    (s, dir) => {
      val c = load(s, dir, "customer")
        .withColumn("sigla", element_at(array(siglaArr.map(lit): _*),
          pmod(col("c_custkey"), lit(Dims.ufs.size)).cast("int") + 1))
      c.join(broadcast(Dims.ufDim(s)), Seq("sigla"))
        .groupBy(col("regiao"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("regiao"))
    },
    Some(s"""
      WITH uf(sigla, nome, regiao, ibge) AS (VALUES $ufValues)
      SELECT regiao, COUNT(*) AS n_customers,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      FROM (SELECT (${sqlList(siglaArr)})[CAST(c_custkey % ${Dims.ufs.size} AS INT) + 1] AS sigla, c_acctbal
            FROM customer) c
      JOIN uf USING (sigla)
      GROUP BY regiao ORDER BY regiao"""))

  /** F6 — "Município - UF" split + broadcast lookup to the IBGE code
    * (reference `regions.py:152-161` + `municipalities.py:54-89`) over
    * the FULL 5,571-row IBGE dim: inputs are built as "nome - uf" with
    * noisy case by indexing customers into the código-ordered dim (a
    * broadcast join, not a 5,571-element literal array), then split
    * relationally, normalized, and looked up back against the dim.
    */
  val g04 = Q("g04_municipio_lookup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val n = Dims.municipios.size
      val indexed = Dims.municipioDim(s).withColumn("_all", lit(0))
        .withColumn("idx", (row_number().over(Window.partitionBy(col("_all"))
          .orderBy(col("codigo_ibge"))) - 1).cast("int"))
        .drop("_all")
      val inputs = load(s, dir, "customer")
        .withColumn("idx", pmod(col("c_custkey"), lit(n)).cast("int"))
        .join(broadcast(indexed), Seq("idx"))
        .select(col("c_custkey"),
          concat(col("nome"), lit(" - "),
            when(pmod(col("c_custkey"), lit(2)) === 0, lower(col("uf")))
              .otherwise(col("uf"))).as("raw"))
      val (muniRaw, ufRaw) = Dims.splitMunicipioUf(col("raw"))
      val lk = broadcast(Dims.municipioLookup(s))
      inputs
        .withColumn("k", G.stripAccents(lower(trim(muniRaw))))
        .withColumn("uf", ufRaw)
        .join(lk, Seq("k", "uf"))
        .select(col("c_custkey"), col("raw"), col("nome"), col("uf"),
          col("codigo_ibge"))
        .orderBy(col("c_custkey"))
    },
    Some {
      val vals = Dims.municipios
        .map { case (c, nm, u) => s"($c,'${nm.replace("'", "''")}','$u')" }
        .mkString(", ")
      s"""
      WITH muni(codigo_ibge, nome, uf) AS (VALUES $vals),
      indexed AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY codigo_ibge) - 1 AS INT) AS idx
        FROM muni),
      inputs AS (
        SELECT c_custkey,
          concat(m.nome, ' - ',
            CASE WHEN c_custkey % 2 = 0 THEN lower(m.uf) ELSE m.uf END) AS raw
        FROM (SELECT c_custkey, CAST(c_custkey % ${Dims.municipios.size} AS INT) AS idx
              FROM customer) t
        JOIN indexed m USING (idx))
      SELECT i.c_custkey, i.raw, m.nome, m.uf, m.codigo_ibge
      FROM inputs i
      JOIN muni m
        ON strip_accents(lower(trim(regexp_extract(trim(i.raw), '^(.+?)\\s*[-/]\\s*([A-Za-z]{2})$$', 1)))) =
           strip_accents(lower(m.nome))
       AND upper(regexp_extract(trim(i.raw), '^(.+?)\\s*[-/]\\s*([A-Za-z]{2})$$', 2)) = m.uf
      ORDER BY i.c_custkey"""
    })

  /** Fuzzy município lookup: misspelled names (3rd character dropped,
    * every 37th municipality) resolved to the nearest dim entry by
    * Levenshtein distance over accent-stripped lowercase keys,
    * candidates BLOCKED to the same UF (≤853 rows/UF) so the edit
    * distance never runs against the whole 5,570-row dim — the typo
    * fallback g04's exact lookup needs (reference normalize semantics,
    * `normalize/municipalities.py`). Deterministic tie-break
    * (dist, codigo) via row_number; both engines compute the identical
    * distance matrix.
    */
  val g05 = Q("g05_fuzzy_lookup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dim = Dims.municipioDim(s)
      val inputs = dim
        .filter(pmod(col("codigo_ibge"), lit(37)) === 0 && length(col("nome")) > 4)
        .select(col("codigo_ibge").as("src_codigo"), col("uf"),
          concat(substring(col("nome"), 1, 2), expr("substring(nome, 4)")).as("typo"))
      val cand = inputs
        .join(broadcast(dim.select(col("codigo_ibge"), col("nome"), col("uf"))),
          Seq("uf"))
        .withColumn("dist", levenshtein(
          G.stripAccents(lower(col("typo"))),
          G.stripAccents(lower(col("nome")))).cast("long"))
      val w = Window.partitionBy(col("src_codigo"))
        .orderBy(col("dist"), col("codigo_ibge"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("src_codigo"), col("typo"),
          col("codigo_ibge").as("match_codigo"), col("nome").as("match_nome"),
          col("dist"))
        .orderBy(col("src_codigo"))
    },
    Some {
      val vals = Dims.municipios
        .map { case (c, nm, u) => s"($c,'${nm.replace("'", "''")}','$u')" }
        .mkString(", ")
      s"""
      WITH muni(codigo_ibge, nome, uf) AS (VALUES $vals),
      inputs AS (
        SELECT codigo_ibge AS src_codigo, uf,
               substr(nome, 1, 2) || substr(nome, 4) AS typo
        FROM muni WHERE codigo_ibge % 37 = 0 AND length(nome) > 4),
      cand AS (
        SELECT i.src_codigo, i.typo, m.codigo_ibge, m.nome,
          CAST(levenshtein(strip_accents(lower(i.typo)),
                           strip_accents(lower(m.nome))) AS BIGINT) AS dist
        FROM inputs i JOIN muni m USING (uf)),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY src_codigo ORDER BY dist, codigo_ibge) AS rn
        FROM cand)
      SELECT src_codigo, typo, codigo_ibge AS match_codigo,
             nome AS match_nome, dist
      FROM ranked WHERE rn = 1 ORDER BY src_codigo"""
    })

  def qs: Seq[Q] = Seq(g01, g02, g03, g04, g05)
}
