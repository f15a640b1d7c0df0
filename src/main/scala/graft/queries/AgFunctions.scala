package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._
import graft.functions.{GraftFunctions => G}

/** Ag-domain scalar function family (SURVEY §2.7 F1-F11) exercised as
  * oracle-checked queries: each query constructs deterministic inputs
  * from the test tables on BOTH sides, runs the custom expression on the
  * Spark side, and the oracle states the expected arithmetic result
  * directly. All expressions are codegen'd Catalyst expressions — no
  * UDFs in any hot path.
  */
object AgFunctions {

  /** F1/F11 — BR decimal parse: comma decimal, currency prefix,
    * thousands dots, signed percent variation, junk→null
    * (reference `cepea/parsers/v1.py:236-255`, `noticias_agricolas/parser.py:98-108`).
    */
  val f01 = Q("f01_parse_br_decimal",
    (s, dir) => {
      val o = load(s, dir, "orders").filter(col("o_orderkey") >= 1000)
      val k = col("o_orderkey")
      o.select(k,
          G.parseBrDecimal(concat(k.cast("string"), lit(",25")))
            .cast("double").as("p_comma"),
          G.parseBrDecimal(concat(lit("R$ "), k.cast("string"), lit(",5")))
            .cast("double").as("p_currency"),
          G.parseBrDecimal(concat(expr("o_orderkey div 1000").cast("string"), lit("."),
            lpad(pmod(k, lit(1000)).cast("string"), 3, "0"), lit(",50")))
            .cast("double").as("p_thousands"),
          G.parseBrDecimal(lit("+0,5%")).cast("double").as("p_variation"),
          G.parseBrDecimal(lit("abc")).cast("double").as("p_junk"))
        .orderBy(k)
    },
    Some("""
      SELECT o_orderkey,
        o_orderkey + 0.25 AS p_comma,
        o_orderkey + 0.5 AS p_currency,
        o_orderkey + 0.5 AS p_thousands,
        0.5 AS p_variation,
        CAST(NULL AS DOUBLE) AS p_junk
      FROM orders WHERE o_orderkey >= 1000 ORDER BY o_orderkey"""))

  /** F2 — multi-format date parse: each row formatted in one of three
    * BR-common formats, parsed back by the first-format-that-sticks
    * chain (reference `cepea/parsers/v1.py:216-234`).
    */
  val f02 = Q("f02_parse_date_multi",
    (s, dir) => {
      val o = load(s, dir, "orders")
      val d = col("o_orderdate")
      val str = when(pmod(col("o_orderkey"), lit(3)) === 0, date_format(d, "dd/MM/yyyy"))
        .when(pmod(col("o_orderkey"), lit(3)) === 1, date_format(d, "dd-MM-yyyy"))
        .otherwise(date_format(d, "yyyy-MM-dd"))
      o.select(col("o_orderkey"), str.as("date_str"),
          G.parseDateMulti(str).as("parsed"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
             WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d-%m-%Y')
             ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str,
        CAST(o_orderdate AS DATE) AS parsed
      FROM orders ORDER BY o_orderkey"""))

  private val accented = Seq("São Paulo", "Ribeirão Prêto", "café açúcar",
    "maçã e amora", "vale do rio doce", "mogi das cruzes",
    "feira de santana", "Paraná")
  private val titled = Seq("São Paulo", "Ribeirão Prêto", "Café Açúcar",
    "Maçã e Amora", "Vale do Rio Doce", "Mogi das Cruzes",
    "Feira de Santana", "Paraná")

  /** F3/F6 — accent strip (NFKD) + Portuguese title-case (small words
    * stay lowercase) over deterministic accented strings
    * (reference `normalize/crops.py:6-8`, `normalize/regions.py:133-149`).
    */
  val f03 = Q("f03_normalize_text",
    (s, dir) => {
      val n = load(s, dir, "nation")
      val idx = pmod(col("n_nationkey"), lit(accented.size)).cast("int")
      val orig = element_at(array(accented.map(lit): _*), idx + 1)
      n.select(col("n_nationkey"), orig.as("orig"),
          G.stripAccents(orig).as("stripped"),
          G.titleCasePt(orig).as("titled"))
        .orderBy(col("n_nationkey"))
    },
    Some(s"""
      SELECT n_nationkey,
        (['${accented.mkString("','")}'])[CAST(n_nationkey % ${accented.size} AS INT) + 1] AS orig,
        strip_accents((['${accented.mkString("','")}'])[CAST(n_nationkey % ${accented.size} AS INT) + 1]) AS stripped,
        (['${titled.mkString("','")}'])[CAST(n_nationkey % ${accented.size} AS INT) + 1] AS titled
      FROM nation ORDER BY n_nationkey"""))

  /** F7 — exact-decimal unit conversion through the kg pivot: sc60↔kg,
    * ton→sc60, product-specific bushel, arroba
    * (reference `normalize/units.py:39-198`).
    */
  val f04 = Q("f04_convert_unit",
    (s, dir) => {
      val li = load(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
      val q = dec(col("l_quantity"))
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          G.convertUnit(q, lit("sc60"), lit("kg"), lit(null).cast("string"))
            .cast("double").as("kg_from_sc60"),
          G.convertUnit(q, lit("ton"), lit("sc60"), lit(null).cast("string"))
            .cast("double").as("sc60_from_ton"),
          G.convertUnit(q, lit("bushel"), lit("kg"), lit("soja"))
            .cast("double").as("kg_from_bushel_soja"),
          G.convertUnit(q, lit("bushel"), lit("kg"), lit("milho"))
            .cast("double").as("kg_from_bushel_milho"),
          G.convertUnit(q, lit("arroba"), lit("kg"), lit(null).cast("string"))
            .cast("double").as("kg_from_arroba"),
          G.convertUnit(q, lit("parsec"), lit("kg"), lit(null).cast("string"))
            .cast("double").as("unknown_unit"))
        // l_quantity completes the total order: the scaled substrates
        // carry duplicate (l_orderkey, l_linenumber) pairs, and every
        // other output column is a function of quantity, so ties left
        // open here are the one way two engines can disagree
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity,
        ROUND(l_quantity * 60, 4) AS kg_from_sc60,
        ROUND(l_quantity * 1000.0 / 60.0, 4) AS sc60_from_ton,
        ROUND(l_quantity * 27.2155, 4) AS kg_from_bushel_soja,
        ROUND(l_quantity * 25.4012, 4) AS kg_from_bushel_milho,
        ROUND(l_quantity * 15, 4) AS kg_from_arroba,
        CAST(NULL AS DOUBLE) AS unknown_unit
      FROM lineitem WHERE l_orderkey < 2000
      ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** F8 — safra (harvest-year) calendar: group a fact table by the
    * Jul-1-boundary safra of its date (reference `dates.py:15-25`).
    */
  val f05 = Q("f05_safra_group",
    (s, dir) => {
      load(s, dir, "orders")
        .groupBy(G.safraOf(col("o_orderdate").cast("date")).as("safra"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("safra"))
    },
    Some("""
      SELECT concat(CAST(y AS VARCHAR), '/', lpad(CAST((y + 1) % 100 AS VARCHAR), 2, '0')) AS safra,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM (
        SELECT CASE WHEN MONTH(o_orderdate) >= 7 THEN YEAR(o_orderdate)
                    ELSE YEAR(o_orderdate) - 1 END AS y, o_totalprice
        FROM orders) t
      GROUP BY 1 ORDER BY 1"""))

  /** F8 — normalize safra spellings: complete kept, short gets the
    * century pivot at 50, 4/4-digit truncated, slash spaces collapsed
    * (reference `dates.py:36-56`).
    */
  val f06 = Q("f06_normalize_safra",
    (s, dir) => {
      val o = load(s, dir, "orders")
      val y = year(col("o_orderdate"))
      val e2 = lpad(pmod(y + 1, lit(100)).cast("string"), 2, "0")
      val raw = when(pmod(col("o_orderkey"), lit(4)) === 0,
          concat(y.cast("string"), lit("/"), e2))
        .when(pmod(col("o_orderkey"), lit(4)) === 1,
          concat(lpad(pmod(y, lit(100)).cast("string"), 2, "0"), lit("/"), e2))
        .when(pmod(col("o_orderkey"), lit(4)) === 2,
          concat(y.cast("string"), lit("/"), (y + 1).cast("string")))
        .otherwise(concat(lit(" "), y.cast("string"), lit(" / "), e2, lit(" ")))
      o.select(col("o_orderkey"), raw.as("raw_safra"),
          G.normalizeSafra(raw).as("safra"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 4 = 0 THEN concat(CAST(y AS VARCHAR), '/', e2)
             WHEN o_orderkey % 4 = 1 THEN concat(lpad(CAST(y % 100 AS VARCHAR), 2, '0'), '/', e2)
             WHEN o_orderkey % 4 = 2 THEN concat(CAST(y AS VARCHAR), '/', CAST(y + 1 AS VARCHAR))
             ELSE concat(' ', CAST(y AS VARCHAR), ' / ', e2, ' ') END AS raw_safra,
        concat(CAST(y AS VARCHAR), '/', e2) AS safra
      FROM (
        SELECT o_orderkey, YEAR(o_orderdate) AS y,
          lpad(CAST((YEAR(o_orderdate) + 1) % 100 AS VARCHAR), 2, '0') AS e2
        FROM orders) t
      ORDER BY o_orderkey"""))

  /** F9/F10 — futures ticker construct + parse back (month-code letter,
    * 2-digit year → 2000s), and YYYYMM period decompose
    * (reference `b3/models.py:75-81`, `comtrade/parser.py:66-70`).
    */
  val f07 = Q("f07_ticker_period",
    (s, dir) => {
      val o = load(s, dir, "orders")
      val codes = "FGHJKMNQUVXZ".map(_.toString)
      val m = month(col("o_orderdate"))
      val ticker = concat(lit("SOJ"), element_at(array(codes.map(lit): _*), m),
        lpad(pmod(year(col("o_orderdate")), lit(100)).cast("string"), 2, "0"))
      val periodo = date_format(col("o_orderdate"), "yyyyMM")
      o.select(col("o_orderkey"), ticker.as("ticker"),
          G.tickerMonth(ticker).cast("int").as("t_month"),
          G.tickerYear(ticker).as("t_year"),
          periodo.as("periodo"),
          substring(periodo, 1, 4).cast("long").as("ano"),
          substring(periodo, 5, 2).cast("long").as("mes"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
        concat('SOJ', (['F','G','H','J','K','M','N','Q','U','V','X','Z'])[MONTH(o_orderdate)],
               lpad(CAST(YEAR(o_orderdate) % 100 AS VARCHAR), 2, '0')) AS ticker,
        CAST(MONTH(o_orderdate) AS INT) AS t_month,
        CAST(2000 + YEAR(o_orderdate) % 100 AS INT) AS t_year,
        strftime(o_orderdate, '%Y%m') AS periodo,
        CAST(YEAR(o_orderdate) AS BIGINT) AS ano,
        CAST(MONTH(o_orderdate) AS BIGINT) AS mes
      FROM orders ORDER BY o_orderkey"""))

  /** Unicode NFC composition ([[graft.functions.NfcNormalize]]):
    * decomposed accents (base letter + combining mark, U+0301 etc.) are
    * planted onto every 5th doc; after normalization the composed and
    * decomposed spellings must be byte-identical — the invariant that
    * keeps visually-equal strings in one dedup cluster. DuckDB's
    * `nfc_normalize` (utf8proc) is the independent oracle for the Java
    * normalizer; lengths are code-point counts in both engines, so the
    * 2-combining-char contraction is visible in the hash.
    */
  val f08 = Q("f08_nfc_normalize",
    (s, dir) => {
      // "cafe" + combining acute, "Sa" + combining tilde + "o" — NFC
      // composes both; docs not divisible by 5 pass through untouched
      val planted = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(" cafe\u0301 Sa\u0303o')")))
        .otherwise(col("text"))
      load(s, dir, "documents")
        .select(col("doc_id"), planted.as("raw"))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("len_raw"),
          length(G.nfcNormalize(col("raw"))).cast("long").as("len_nfc"),
          col("raw").contains(lit("caf\u00e9")).as("raw_has_composed"),
          G.nfcNormalize(col("raw")).contains(lit("caf\u00e9"))
            .as("nfc_has_composed"),
          substring(G.nfcNormalize(col("raw")), -12, 12).as("tail_nfc"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0
               THEN text || ' cafe' || chr(769) || ' Sa' || chr(771) || 'o'')'
               ELSE text END AS raw
        FROM documents)
      SELECT doc_id,
        CAST(length(raw) AS BIGINT) AS len_raw,
        CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        contains(raw, 'caf' || chr(233)) AS raw_has_composed,
        contains(nfc_normalize(raw), 'caf' || chr(233)) AS nfc_has_composed,
        CASE WHEN length(nfc_normalize(raw)) >= 12
             THEN substring(nfc_normalize(raw), length(nfc_normalize(raw)) - 11, 12)
             ELSE nfc_normalize(raw) END AS tail_nfc
      FROM planted ORDER BY doc_id"""))

  def qs: Seq[Q] = Seq(f01, f02, f03, f04, f05, f06, f07, f08)
}
