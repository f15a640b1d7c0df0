package graft.ingest

import java.time.LocalDate

import graft.dims.Dims

/** S2/S4 — CONAB "Progresso de safra" workbook parser: a stateful walk
  * over the sheet grid where crop ("Soja - Safra 2025/26") and operation
  * ("Semeadura" / "Colheita *") headers carry forward onto the estado
  * rows below them, and the reporting week is a row of Excel date
  * serials (reference `conab/progresso/parser.py:50-187`,
  * `conab/progresso/models.py:73-99`). Driver-side by design: one
  * workbook is KB-scale; the extracted records feed the relational
  * layer like any other golden source.
  */
object ConabProgresso {

  final case class Record(
      cultura: String, safra: String, operacao: String, estado: String,
      semanaAtual: String, pctAnoAnterior: Option[Double],
      pctSemanaAnterior: Option[Double], pctSemanaAtual: Option[Double],
      pctMedia5Anos: Option[Double])

  private val CulturaRe = """^(.+?)\s*-\s*Safra\s+(\d{4}/\d{2})$""".r
  private val OperacaoRe = """^(Semeadura|Colheita)\s*\*?\s*$""".r

  /** Full-name → sigla (reference `ESTADOS_PARA_UF`); unknown names pass
    * through unchanged, like the reference's `estado_para_uf`.
    */
  private val estadoParaUf: Map[String, String] =
    Dims.ufs.map { case (sigla, nome, _, _) => nome -> sigla }.toMap

  /** Excel 1900-system serial → ISO date (epoch 1899-12-30). */
  def serialToDate(serial: Long): String =
    LocalDate.of(1899, 12, 30).plusDays(serial).toString

  /** BR-decimal/percent-tolerant float (reference `_safe_float`). */
  private def safeFloat(raw: String): Option[Double] = {
    val s = raw.trim.replace(",", ".").stripSuffix("%").trim
    if (s.isEmpty) None
    else s.toDoubleOption.map(v => if (raw.contains("%") && v > 1) v / 100.0 else v)
  }

  private def isNumeric(s: String): Boolean = s.trim.nonEmpty &&
    s.trim.replace(",", ".").toDoubleOption.isDefined

  def parse(grid: Seq[Seq[String]]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var cultura: Option[String] = None
    var safra: Option[String] = None
    var operacao: Option[String] = None
    var semana = ""
    var inDataRows = false

    for (row <- grid) {
      val vals = row.padTo(6, "")
      val col1 = vals(1).trim

      col1 match {
        case CulturaRe(c, s) =>
          cultura = Some(c.trim); safra = Some(s); operacao = None
          inDataRows = false
        case OperacaoRe(op) =>
          operacao = Some(op); inDataRows = false
        case "Estado" if cultura.isDefined && operacao.isDefined =>
          inDataRows = false
        case _ =>
          // week row: no estado label, date serials in the value columns
          // (openpyxl sees these as datetimes via the cell style; on the
          // raw grid a serial is a numeric >= 20000 ≈ year 1954+)
          val window = vals.slice(2, 5).filter(_.trim.nonEmpty)
          val isSerialRow = col1.isEmpty && window.nonEmpty &&
            window.forall(v => isNumeric(v) && v.trim.replace(",", ".").toDouble >= 20000)
          if (isSerialRow) {
            semana = serialToDate(window.last.trim.replace(",", ".").toDouble.toLong)
            inDataRows = true
          } else if (inDataRows && cultura.isDefined && operacao.isDefined &&
            col1.nonEmpty) {
            val lower = col1.toLowerCase
            if (col1.startsWith("*") || col1.startsWith("(") ||
              lower.contains("estados") || lower.contains("brasil") ||
              lower.startsWith("estimativa")) ()
            else if (lower.startsWith("valores") || lower.startsWith("percentual"))
              inDataRows = false
            else {
              val cleaned = col1.replaceAll("\\s+", " ")
              out += Record(cultura.get, safra.get, operacao.get,
                estadoParaUf.getOrElse(cleaned, cleaned), semana,
                safeFloat(vals(2)), safeFloat(vals(3)), safeFloat(vals(4)),
                safeFloat(vals(5)))
            }
          }
      }
    }
    out.result()
  }

  /** Reference entry point shape: pick the sheet whose name mentions
    * "progresso" (fall back to the first), then parse its grid.
    */
  def parseWorkbook(path: String): Seq[Record] = {
    val names = Xlsx.sheetNames(path)
    val sheet = names.find(_.toLowerCase.contains("progresso"))
      .orElse(names.headOption)
      .getOrElse(throw new IllegalArgumentException(s"no sheets in $path"))
    parse(Xlsx.readSheet(path, sheet))
  }
}
