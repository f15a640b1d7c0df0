package graft.ingest

import java.util.zip.Inflater

import scala.collection.mutable

/** S5 — minimal dependency-free PDF text extraction: enough of the spec
  * (ISO 32000) to drive the ANDA table pipeline from PDF bytes
  * (reference `anda/parser.py:104-119` uses pdfplumber for the same
  * step). Scope: FlateDecode streams, BT/ET text objects, Tm/Td/TD/T*
  * positioning, Tj/TJ/'/" show ops, literal + hex strings, Latin-1
  * byte mapping. Out of scope (documented boundary): glyph-width
  * advances, CID/ToUnicode CMaps, encrypted files — the table
  * reconstruction relies on each cell being its own positioned run,
  * which is how report generators emit grid text.
  */
object Pdf {

  /** One positioned text run (PDF user-space coords, y grows upward). */
  final case class Run(x: Double, y: Double, text: String)

  /** All FlateDecode-compressed stream payloads, inflated. The file is
    * scanned structurally (obj..stream..endstream) — no xref needed, so
    * truncated/appended files still yield their streams.
    */
  def decodedStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val s = new String(bytes, "ISO-8859-1") // 1:1 byte<->char, indices align
    val out = Seq.newBuilder[Array[Byte]]
    var from = 0
    while ({ val i = s.indexOf("stream", from); i >= 0 && {
      val dictStart = s.lastIndexOf("<<", i)
      val dict = if (dictStart >= 0) s.substring(dictStart, i) else ""
      var dataStart = i + "stream".length
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
      val end = s.indexOf("endstream", dataStart)
      if (end < 0) { from = s.length; false }
      else {
        // trailing EOL before "endstream" is not stream data
        var dataEnd = end
        if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
        if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
        if (dict.contains("/FlateDecode")) {
          val raw = bytes.slice(dataStart, dataEnd)
          try out += inflate(raw)
          catch { case _: Exception => () } // non-content stream; skip
        }
        from = end + "endstream".length
        true
      }
    }}) ()
    out.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) throw new java.util.zip.DataFormatException("stalled")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Interpret every text-bearing content stream into positioned runs. */
  def textRuns(bytes: Array[Byte]): Seq[Run] =
    decodedStreams(bytes)
      .map(b => new String(b, "ISO-8859-1"))
      .filter(_.contains("BT"))
      .flatMap(runsOfContent)

  private sealed trait Tok
  private final case class Num(v: Double) extends Tok
  private final case class Str(v: String) extends Tok
  private final case class Arr(v: Seq[Tok]) extends Tok
  private final case class Op(v: String) extends Tok

  /** Content-stream tokenizer: numbers, /names (dropped), (strings) with
    * escapes, <hex>, [arrays], everything else an operator keyword.
    */
  private def tokenize(s: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private def skipWs(): Unit = {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == '%')) {
        if (s.charAt(i) == '%') while (i < s.length && s.charAt(i) != '\n') i += 1
        else i += 1
      }
    }
    skipWs()
    def hasNext: Boolean = i < s.length
    def next(): Tok = {
      val t = s.charAt(i) match {
        case '(' => Str(literalString())
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' => i += 2; Op("<<")
        case '<' => Str(hexString())
        case '>' if i + 1 < s.length && s.charAt(i + 1) == '>' => i += 2; Op(">>")
        case '[' => i += 1; Arr(arrayItems())
        case ']' => i += 1; Op("]") // stray closer (arrayItems consumes its own)
        case '/' => i += 1; val st = i
          while (i < s.length && !delim(s.charAt(i))) i += 1
          Op("/" + s.substring(st, i))
        case c if c == '+' || c == '-' || c == '.' || c.isDigit =>
          val st = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
          Num(s.substring(st, i).toDouble)
        case _ =>
          val st = i
          while (i < s.length && !delim(s.charAt(i))) i += 1
          if (i == st) i += 1
          Op(s.substring(st, i))
      }
      skipWs()
      t
    }
    private def delim(c: Char): Boolean =
      c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0
    private def literalString(): String = {
      i += 1 // past '('
      val sb = new StringBuilder
      var depth = 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            i += 1
            s.charAt(i) match {
              case 'n' => sb += '\n'; i += 1
              case 'r' => sb += '\r'; i += 1
              case 't' => sb += '\t'; i += 1
              case 'b' => sb += '\b'; i += 1
              case 'f' => sb += '\f'; i += 1
              case c @ ('(' | ')' | '\\') => sb += c; i += 1
              case c if c >= '0' && c <= '7' =>
                val st = i
                while (i < s.length && i - st < 3 && s.charAt(i) >= '0' && s.charAt(i) <= '7') i += 1
                sb += Integer.parseInt(s.substring(st, i), 8).toChar
              case '\n' => i += 1 // line continuation
              case c => sb += c; i += 1
            }
          case '(' => depth += 1; sb += '('; i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) sb += ')'
            i += 1
          case c => sb += c; i += 1
        }
      }
      sb.toString
    }
    private def hexString(): String = {
      i += 1 // past '<'
      val st = i
      while (i < s.length && s.charAt(i) != '>') i += 1
      val hex = s.substring(st, i).filterNot(_.isWhitespace)
      i += 1 // past '>'
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
    }
    private def arrayItems(): Seq[Tok] = {
      val items = Seq.newBuilder[Tok]
      skipWs()
      while (i < s.length && s.charAt(i) != ']') {
        s.charAt(i) match {
          case '(' => items += Str(literalString())
          case '<' => items += Str(hexString())
          case c if c == '+' || c == '-' || c == '.' || c.isDigit =>
            val st = i
            i += 1
            while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
            items += Num(s.substring(st, i).toDouble)
          case _ => i += 1
        }
        skipWs()
      }
      if (i < s.length && s.charAt(i) == ']') i += 1 // consume the closer
      items.result()
    }
  }

  /** Text-object interpreter: tracks the line matrix translation
    * (Tm/Td/TD/T*) and emits one Run per show op at the current origin.
    */
  private def runsOfContent(content: String): Seq[Run] = {
    val out = mutable.ArrayBuffer.empty[Run]
    val operands = mutable.ArrayBuffer.empty[Tok]
    var lineX, lineY, x, y, leading = 0.0
    def num(k: Int): Double = operands.takeRight(k).headOption match {
      case Some(Num(v)) => v
      case _ => 0.0
    }
    def show(t: String): Unit = if (t.nonEmpty) out += Run(x, y, t)
    def nextLine(): Unit = { lineY -= leading; x = lineX; y = lineY }
    for (tok <- tokenize(content)) tok match {
      case Op("BT") => lineX = 0; lineY = 0; x = 0; y = 0; leading = 0; operands.clear()
      case Op("Tm") =>
        lineX = num(2); lineY = num(1); x = lineX; y = lineY; operands.clear()
      case Op("Td") =>
        lineX += num(2); lineY += num(1); x = lineX; y = lineY; operands.clear()
      case Op("TD") =>
        leading = -num(1); lineX += num(2); lineY += num(1); x = lineX; y = lineY
        operands.clear()
      case Op("TL") => leading = num(1); operands.clear()
      case Op("T*") => nextLine(); operands.clear()
      case Op("Tj") =>
        operands.lastOption.foreach { case Str(t) => show(t); case _ => () }
        operands.clear()
      case Op("'") =>
        nextLine()
        operands.lastOption.foreach { case Str(t) => show(t); case _ => () }
        operands.clear()
      case Op("\"") =>
        nextLine()
        operands.lastOption.foreach { case Str(t) => show(t); case _ => () }
        operands.clear()
      case Op("TJ") =>
        operands.lastOption.foreach {
          case Arr(items) =>
            show(items.collect { case Str(t) => t }.mkString)
          case _ => ()
        }
        operands.clear()
      case Op(_) => operands.clear() // any other operator consumes its operands
      case t => operands += t
    }
    out.toSeq
  }

  /** Cluster positioned runs into a row/column grid: rows by y (top to
    * bottom), columns by x start position, both with a point tolerance —
    * the same geometric binning a table extractor performs.
    */
  def grid(runs: Seq[Run], tol: Double = 3.0): Seq[Seq[String]] = {
    if (runs.isEmpty) return Seq.empty
    def clusters(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      val reps = mutable.ArrayBuffer(sorted.head)
      for (v <- sorted.tail) if (v - reps.last > tol) reps += v
      reps.toSeq
    }
    def assign(v: Double, reps: Seq[Double]): Int =
      reps.lastIndexWhere(r => v >= r - tol) match { case -1 => 0; case i => i }
    val rowReps = clusters(runs.map(_.y)).reverse // top (max y) first
    val colReps = clusters(runs.map(_.x))
    val cells = mutable.Map.empty[(Int, Int), String]
    for (r <- runs) {
      val key = (rowReps.indexWhere(rep => math.abs(rep - r.y) <= tol) match {
        case -1 => assign(-r.y, rowReps.map(-_))
        case i => i
      }, assign(r.x, colReps))
      cells(key) = cells.get(key).map(_ + " " + r.text).getOrElse(r.text)
    }
    (0 until rowReps.size).map(ri =>
      (0 until colReps.size).map(ci => cells.getOrElse((ri, ci), "")))
  }

  /** PDF bytes → table grid (the pdfplumber `extract_tables` step of the
    * reference's ANDA pipeline, for cell-per-run report PDFs).
    */
  def tableGrid(bytes: Array[Byte]): Seq[Seq[String]] = grid(textRuns(bytes))
}
