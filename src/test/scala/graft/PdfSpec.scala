package graft

import java.nio.file.{Files, Paths}

import graft.ingest.{Anda, Pdf}

/** S5 — PDF text extraction: codec unit tests plus the ANDA pipeline
  * driven end-to-end from PDF BYTES. The reference corpus ships only the
  * pdfplumber-extracted grid (no original PDF), so the fixture here
  * renders that captured grid back into a real PDF (FlateDecode content
  * stream, one positioned run per cell — the layout report generators
  * produce) and asserts the full chain PDF -> streams -> runs -> grid ->
  * month series reproduces expected.json.
  */
class PdfSpec extends org.scalatest.funsuite.AnyFunSuite {

  // --- fixture: minimal single-page PDF writer (test-only) ---

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Render a grid as one positioned text run per nonempty cell. */
  private def pdfOfGrid(grid: Seq[Seq[String]]): Array[Byte] = {
    val content = new StringBuilder
    for ((row, ri) <- grid.zipWithIndex; (cell, ci) <- row.zipWithIndex
         if cell.nonEmpty) {
      val (x, y) = (40 + 80 * ci, 960 - 16 * ri)
      content ++= s"BT /F1 9 Tf 1 0 0 1 $x $y Tm (${esc(cell)}) Tj ET\n"
    }
    val stream = deflate(content.toString.getBytes("ISO-8859-1"))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size(); w(s"$n 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1)(w("<</Type/Catalog/Pages 2 0 R>>"))
    obj(2)(w("<</Type/Pages/Kids[3 0 R]/Count 1>>"))
    obj(3)(w("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 1000]" +
      "/Resources<</Font<</F1 5 0 R>>>>/Contents 4 0 R>>"))
    obj(4) {
      w(s"<</Length ${stream.length}/Filter/FlateDecode>>stream\n")
      out.write(stream)
      w("\nendstream")
    }
    obj(5)(w("<</Type/Font/Subtype/Type1/BaseFont/Helvetica" +
      "/Encoding/WinAnsiEncoding>>"))
    val xref = out.size()
    w(s"xref\n0 6\n0000000000 65535 f \n" +
      offsets.map(o => f"$o%010d 00000 n \n").mkString)
    w(s"trailer<</Size 6/Root 1 0 R>>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // --- codec unit tests ---

  test("content-stream strings: escapes, octal, hex, TJ kerning arrays") {
    val content = """BT 1 0 0 1 10 100 Tm (par\(en\)s \\ back \101) Tj ET
      BT 1 0 0 1 10 80 Tm [(Ma) -120 (r\347o)] TJ ET
      BT 1 0 0 1 10 60 Tm <48692121> Tj ET"""
    val pdf = wrapRaw(content)
    val runs = Pdf.textRuns(pdf)
    assert(runs.map(_.text) == Seq("par(en)s \\ back A", "Março", "Hi!!"))
    assert(runs.map(_.y) == Seq(100.0, 80.0, 60.0))
  }

  test("Td/TD/T*/' leading-relative positioning") {
    val content = """BT 2 TL 1 0 0 1 50 200 Tm (a) Tj 0 -10 Td (b) Tj T* (c) Tj (d) ' ET"""
    val runs = Pdf.textRuns(wrapRaw(content))
    assert(runs.map(r => (r.text, r.x, r.y)) ==
      Seq(("a", 50.0, 200.0), ("b", 50.0, 190.0), ("c", 50.0, 188.0), ("d", 50.0, 186.0)))
  }

  test("grid clustering: rows by y, columns by x, cell merge on same spot") {
    val runs = Seq(Pdf.Run(40, 100, "h1"), Pdf.Run(120, 100, "h2"),
      Pdf.Run(40, 84, "a"), Pdf.Run(120, 84.5, "1"), Pdf.Run(40, 68, "b"))
    assert(Pdf.grid(runs) ==
      Seq(Seq("h1", "h2"), Seq("a", "1"), Seq("b", "")))
  }

  private def wrapRaw(content: String): Array[Byte] = {
    val stream = deflate(content.getBytes("ISO-8859-1"))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj\n<</Length " + stream.length +
      "/Filter/FlateDecode>>stream\n")
    out.write(stream)
    w("\nendstream\nendobj\n%%EOF\n")
    out.toByteArray
  }

  // --- ANDA end-to-end from PDF bytes ---

  test("anda/entregas_sample driven from PDF bytes: decode -> grid -> month series") {
    val dir = "/root/reference/tests/golden_data/anda/entregas_sample"
    assume(Files.exists(Paths.get(s"$dir/response.json")))
    // captured pdfplumber grid -> expanded rows -> rendered into a PDF
    val raw = ujsonGrid(Files.readString(Paths.get(s"$dir/response.json")))
    val pdfBytes = pdfOfGrid(Anda.expandPackedCells(raw))

    val grid = Pdf.tableGrid(pdfBytes)
    val series = Anda.monthSeries(grid, "2024")
    assert(series.map(_._1) == (1 to 12))
    val vols = series.map { case (m, v) =>
      (m, v.replace(".", "").replace(",", ".").toDouble) }
    // expected.json: 12 rows, first (mes=1, 3699769.0); spot-check tail
    assert(vols.head == (1, 3699769.0))
    assert(vols(11) == (12, 3609235.0))
    assert(vols.map(_._2).sum == 45615968.0) // "Total do Ano" 2024
  }

  /** Parse the golden capture's JSON array-of-arrays without Spark. */
  private def ujsonGrid(json: String): Seq[Seq[String]] = {
    // tiny recursive-descent parse for [[str|null,...],...]
    var i = 0
    def ws(): Unit = while (i < json.length && json.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(json.charAt(i) == c, s"want $c at $i"); i += 1 }
    def str(): String = {
      expect('"'); val sb = new StringBuilder
      while (json.charAt(i) != '"') {
        if (json.charAt(i) == '\\') {
          i += 1
          json.charAt(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += json.charAt(i)
        i += 1
      }
      i += 1; sb.toString
    }
    def cell(): String = { ws()
      if (json.charAt(i) == '"') str()
      else { require(json.startsWith("null", i), s"want null at $i"); i += 4; "" } }
    def row(): Seq[String] = { expect('[')
      val cells = Seq.newBuilder[String]
      ws()
      if (json.charAt(i) != ']') { cells += cell(); ws()
        while (json.charAt(i) == ',') { i += 1; cells += cell(); ws() } }
      expect(']'); cells.result() }
    expect('[')
    val rows = Seq.newBuilder[Seq[String]]
    ws()
    if (json.charAt(i) != ']') { rows += row(); ws()
      while (json.charAt(i) == ',') { i += 1; rows += row(); ws() } }
    rows.result()
  }
}
