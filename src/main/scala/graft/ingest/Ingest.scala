package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}

/** Format scans (SURVEY §2.1 S1-S6). The 25 reference sources are
  * MB-scale driver-side fetches; the Spark concern is getting them into
  * DataFrames with the right parsing semantics:
  *  - CSV (S3): `;` separator, ISO-8859-1/latin-1 encoding, BR decimal
  *    commas — all expressed as reader options + the parse_br_decimal
  *    expression, so the decode runs distributed on executors.
  *  - JSON long format (S6): SIDRA-style payloads where the FIRST row
  *    carries the header names; renamed relationally.
  *  - HTML (S1/S2): a dependency-free table extractor (this environment
  *    ships no jsoup); candidate tables ranked by id/class hints then
  *    size, positional carry-forward left to the W6 window.
  * XLSX/PDF decoding (S4/S5) needs codecs not present here; their
  * post-decode logic (header-row discovery, wide-block column groups,
  * R6) operates on extracted row grids and is fully implemented below.
  */
object Ingest {

  /** F12 — encoding detection chain (reference
    * `normalize/encoding.py:10-78`): declared first, then utf-8,
    * iso-8859-1, cp1252, utf-16, ascii — first strict decode wins;
    * final fallback decodes utf-8 with replacement. Returns
    * (charsetName, text).
    */
  def detectEncoding(bytes: Array[Byte],
      declared: Option[String] = None): (String, String) = {
    import java.nio.charset.{Charset, CodingErrorAction}
    val chain = declared.toSeq ++
      Seq("UTF-8", "ISO-8859-1", "windows-1252", "UTF-16", "US-ASCII")
    chain.distinct.flatMap { name =>
      scala.util.Try {
        val dec = Charset.forName(name).newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        name -> dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      }.toOption
    }.headOption.getOrElse {
      "UTF-8//REPLACE" -> new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** S3 — BR CSV scan: explicit schema-free read with separator +
    * encoding options; BR-decimal columns parsed via the codegen'd
    * expression (never a driver-side loop).
    */
  def csvScanBr(spark: SparkSession, path: String, sep: String = ";",
      encoding: String = "ISO-8859-1", brDecimalCols: Seq[String] = Seq.empty,
      header: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("sep", sep)
      .option("encoding", encoding)
      .option("header", header.toString)
      .csv(path)
    brDecimalCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, G.parseBrDecimal(col(c))))
  }

  /** S9 — the write twin of [[csvScanBr]]: export with the same BR
    * conventions (`;` separator, latin-1, comma-decimal numbers with
    * dot thousands groups) so downstream BR tooling — and this
    * engine's own reader — consume it unchanged. Numeric formatting is
    * the `translate`-swapped US format_number, all codegen; the
    * round trip reader∘writer = identity is asserted in spec.
    */
  def csvExportBr(df: DataFrame, path: String,
      brDecimalCols: Seq[String] = Seq.empty, decimals: Int = 4,
      sep: String = ";", encoding: String = "ISO-8859-1"): Unit = {
    val out = brDecimalCols.foldLeft(df)((d, c) =>
      d.withColumn(c, G.formatBrDecimal(col(c), decimals)))
    out.write
      .option("sep", sep)
      .option("encoding", encoding)
      .option("header", "true")
      .mode("overwrite")
      .csv(path)
  }

  /** S6 — JSON long-format scan where row 0 is the header record
    * (SIDRA shape, reference `ibge/client.py:237-267`): read, take the
    * single header row (1-row collect — header metadata, not data),
    * rename, drop it.
    */
  def jsonLongScan(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
      .withColumn("__rn", monotonically_increasing_id())
    val headerRow = raw.orderBy(col("__rn")).limit(1).drop("__rn").collect()(0)
    val dataCols = headerRow.schema.fieldNames
    val renames = dataCols.map(c => c -> Option(headerRow.getAs[String](c)).getOrElse(c))
    val minRn = raw.agg(min(col("__rn"))).collect()(0).getLong(0)
    renames.foldLeft(raw.filter(col("__rn") =!= minRn).drop("__rn")) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
  }

  /** Minimal HTML table extraction (S1): returns each <table> as a row
    * grid with its id/class attributes. Tag-level scanner, no regex
    * backtracking, no external deps.
    */
  final case class HtmlTable(id: String, cssClass: String, rows: Seq[Seq[String]])

  def htmlTables(html: String): Seq[HtmlTable] = {
    val tables = scala.collection.mutable.ListBuffer.empty[HtmlTable]
    var i = 0
    val lower = html.toLowerCase
    while ({ i = lower.indexOf("<table", i); i >= 0 }) {
      val end = lower.indexOf("</table>", i)
      val stop = if (end < 0) html.length else end
      val tagEnd = html.indexOf('>', i)
      val attrs = if (tagEnd > 0 && tagEnd < stop) html.substring(i + 6, tagEnd) else ""
      def attr(name: String): String = {
        val m = s"""$name\\s*=\\s*["']([^"']*)["']""".r
        m.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("")
      }
      val body = html.substring(math.min(tagEnd + 1, stop), stop)
      tables += HtmlTable(attr("id"), attr("class"), extractRows(body))
      i = stop + 1
    }
    tables.toList
  }

  private def extractRows(tableBody: String): Seq[Seq[String]] = {
    val lower = tableBody.toLowerCase
    val rows = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    var i = 0
    while ({ i = lower.indexOf("<tr", i); i >= 0 }) {
      val end = lower.indexOf("</tr>", i)
      val stop = if (end < 0) tableBody.length else end
      val rowHtml = tableBody.substring(i, stop)
      val cells = "(?is)<t[dh][^>]*>(.*?)</t[dh]>".r
        .findAllMatchIn(rowHtml)
        .map(m => stripTags(m.group(1)).trim)
        .toSeq
      if (cells.nonEmpty) rows += cells
      i = stop + 1
    }
    rows.toList
  }

  private def stripTags(s: String): String =
    "(?s)<[^>]*>".r.replaceAllIn(s, " ").replaceAll("&nbsp;", " ")
      .replaceAll("\\s+", " ")

  /** S1 — candidate selection (reference `cepea/parsers/v1.py:73-157`):
    * prefer tables whose id/class matches the hint, then header-keyword
    * hits, then row count.
    */
  def bestTable(tables: Seq[HtmlTable], idHint: String,
      headerKeywords: Seq[String]): Option[HtmlTable] = {
    def score(t: HtmlTable): (Int, Int, Int) = {
      val idScore = if (t.id.toLowerCase.contains(idHint.toLowerCase) ||
        t.cssClass.toLowerCase.contains(idHint.toLowerCase)) 1 else 0
      val kwScore = t.rows.headOption.map { h =>
        headerKeywords.count(k => h.exists(_.toLowerCase.contains(k.toLowerCase)))
      }.getOrElse(0)
      (idScore, kwScore, t.rows.size)
    }
    tables.sortBy(score).reverseIterator.find(_.rows.nonEmpty)
  }

  /** S4 — header-row discovery on an extracted row grid (reference
    * `conab/parsers/v1.py:39-58`): first row containing at least
    * `minHits` keyword cells; data starts at `headerRow + dataOffset`.
    */
  def findHeaderRow(rows: Seq[Seq[String]], keywords: Seq[String],
      minHits: Int = 2): Option[Int] =
    rows.indexWhere { r =>
      keywords.count(k => r.exists(_.toLowerCase.contains(k.toLowerCase))) >= minHits
    } match { case -1 => None; case i => Some(i) }

  /** R6 — wide-block column groups → long rows (reference
    * `conab/parsers/v1.py:56-113`): after `idCols` leading columns, the
    * remainder is consecutive groups of `groupLabels.size` columns, one
    * group per `groupKeys` entry (e.g. one (area, produtividade,
    * producao) triple per safra).
    */
  def wideBlocksToLong(rows: Seq[Seq[String]], idCols: Int,
      groupKeys: Seq[String], groupLabels: Seq[String]): Seq[Seq[String]] =
    rows.flatMap { r =>
      val ids = r.take(idCols)
      groupKeys.zipWithIndex.flatMap { case (gk, g) =>
        val start = idCols + g * groupLabels.size
        if (start + groupLabels.size <= r.size) {
          val vals = r.slice(start, start + groupLabels.size)
          groupLabels.zip(vals).map { case (lbl, v) => ids ++ Seq(gk, lbl, v) }
        } else Seq.empty
      }
    }
}
