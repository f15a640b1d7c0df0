package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

/** S4 — dependency-free XLSX reader. OOXML is a ZIP of XML: worksheet
  * cells reference a shared-string table; cell refs ("B3") give column
  * positions. This covers the reference's XLSX sources (CONAB safras,
  * ABIOVE, MapBiomas) without POI; legacy OLE2 .xls (DERAL) still needs
  * a real codec. Driver-side by design — these workbooks are MB-scale
  * ingestion inputs; the extracted grid feeds the relational wide-block
  * and melt operators.
  */
object Xlsx {

  private def entries(path: String, wanted: String => Boolean): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (wanted(e.getName)) out(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  private def dom(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def elems(parent: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }
  private def childElems(parent: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  def sheetNames(path: String): Seq[String] = {
    val es = entries(path, _ == "xl/workbook.xml")
    elems(dom(es("xl/workbook.xml")), "sheet").map(_.getAttribute("name"))
  }

  private def colIdx(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    n - 1
  }

  /** The named sheet as a row grid (rows padded to the sheet's width). */
  def readSheet(path: String, sheetName: String): Seq[Seq[String]] = {
    val meta = entries(path, n => n == "xl/workbook.xml" ||
      n == "xl/_rels/workbook.xml.rels" || n == "xl/sharedStrings.xml")

    val rid = elems(dom(meta("xl/workbook.xml")), "sheet")
      .find(_.getAttribute("name") == sheetName)
      .map(e => Option(e.getAttribute("r:id")).filter(_.nonEmpty)
        .getOrElse(e.getAttribute("id")))
      .getOrElse(throw new NoSuchElementException(
        s"sheet '$sheetName' not in ${sheetNames(path).mkString(", ")}"))

    val target = elems(dom(meta("xl/_rels/workbook.xml.rels")), "Relationship")
      .find(_.getAttribute("Id") == rid)
      .map(_.getAttribute("Target").stripPrefix("/xl/").stripPrefix("./"))
      .getOrElse(throw new IllegalStateException(s"no rel for $rid"))
    val sheetEntry = if (target.startsWith("worksheets/")) s"xl/$target" else target

    val shared: IndexedSeq[String] = meta.get("xl/sharedStrings.xml") match {
      case Some(b) => elems(dom(b), "si").map(si =>
        childElems(si, "t").map(_.getTextContent).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }

    val sheetBytes = entries(path, _ == sheetEntry)(sheetEntry)
    val rows = elems(dom(sheetBytes), "row").map { r =>
      val cells = childElems(r, "c").flatMap { c =>
        val ref = c.getAttribute("r")
        val t = c.getAttribute("t")
        val v = childElems(c, "v").headOption.map(_.getTextContent)
        val value = t match {
          case "s" => v.flatMap(i => shared.lift(i.toInt)).getOrElse("")
          case "inlineStr" => childElems(c, "t").map(_.getTextContent).mkString
          case _ => v.getOrElse("")
        }
        if (ref.nonEmpty) Some(colIdx(ref) -> value) else None
      }.toMap
      val width = if (cells.isEmpty) 0 else cells.keys.max + 1
      (0 until width).map(i => cells.getOrElse(i, ""))
    }
    val width = if (rows.isEmpty) 0 else rows.map(_.size).max
    rows.map(r => r ++ Seq.fill(width - r.size)(""))
  }
}
