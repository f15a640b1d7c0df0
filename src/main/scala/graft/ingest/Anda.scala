package graft.ingest

/** S5 — ANDA fertilizer-indicators table logic (reference
  * `anda/parser.py:124-315`): the extracted PDF grid packs all twelve
  * months (and their per-year values) into single newline-separated
  * cells, which are expanded back into rows before the month series is
  * read off against the requested year's column. Works over any grid
  * source — the golden capture's pdfplumber JSON or [[Pdf.tableGrid]].
  */
object Anda {

  private def noAccents(s: String): String =
    java.text.Normalizer.normalize(s.trim.toLowerCase,
      java.text.Normalizer.Form.NFKD).replaceAll("\\p{M}", "")

  val monthIndex: Map[String, Int] = Seq("janeiro", "fevereiro", "marco",
    "abril", "maio", "junho", "julho", "agosto", "setembro", "outubro",
    "novembro", "dezembro").zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  /** Reference `_expand_newline_cells`: when any cell packs >= 5 lines,
    * split every multi-line row into one row per line (cells with fewer
    * lines pad with "").
    */
  def expandPackedCells(table: Seq[Seq[String]]): Seq[Seq[String]] = {
    val clean = table.map(_.map(c => Option(c).getOrElse("").trim))
    val maxLines = clean.flatMap(_.map(_.count(_ == '\n') + 1)).maxOption.getOrElse(1)
    if (maxLines < 5) clean
    else clean.flatMap { row =>
      val splits = row.map(_.split("\n", -1).toSeq)
      val n = splits.map(_.size).max
      if (n < 2) Seq(row)
      else (0 until n).map(i => splits.map(s => if (i < s.size) s(i).trim else ""))
    }
  }

  /** (mes 1-12, raw value under the `year` column header) for the FIRST
    * section carrying that year header (reference `_parse_indicadores`,
    * `anda/parser.py:315-377`): the year cell fixes the header row and
    * value column, the first month cell below fixes the month column,
    * and the walk stops at the next section (a repeated year header with
    * an empty month cell, or prose >30 chars in the month column).
    */
  def monthSeries(table: Seq[Seq[String]], year: String): Seq[(Int, String)] = {
    val rows = expandPackedCells(table)
    val hdr = rows.indexWhere(_.exists(_.trim == year))
    if (hdr < 0) return Seq.empty
    val yearIdx = rows(hdr).indexWhere(_.trim == year)
    val after = rows.drop(hdr + 1)
    val mesIdx = after.iterator
      .map(_.indexWhere(c => monthIndex.contains(noAccents(c))))
      .find(_ >= 0).getOrElse(-1)
    if (mesIdx < 0) return Seq.empty
    val out = Seq.newBuilder[(Int, String)]
    var done = false
    for (row <- after if !done) {
      if (row.size > math.max(mesIdx, yearIdx)) {
        val mes = row(mesIdx).trim
        if (mes.length > 30) done = true
        else if (row(yearIdx).trim == year && mes.isEmpty) done = true
        else monthIndex.get(noAccents(mes)).foreach(m => out += ((m, row(yearIdx))))
      }
    }
    out.result()
  }
}
