package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** S4/S5 companion — minimal legacy .xls (BIFF8 in an OLE2 compound
  * file) reader, same grid API as [[Xlsx]]. Covers the record types
  * government exports actually use: BOUNDSHEET, SST (with CONTINUE
  * splits), LABELSST, LABEL, NUMBER, RK, MULRK. No formulas, no styles
  * — cached values only. Driver-side ingestion, like every other scan.
  */
object Biff {

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  /** Extract a named stream from the OLE2 compound file (regular FAT
    * chains; a Workbook stream is always above the mini-stream cutoff).
    */
  private def oleStream(data: Array[Byte], streamName: String): Array[Byte] = {
    val buf = le(data)
    val nFat = buf.getInt(44)
    val dirStart = buf.getInt(48)
    val difat = (0 until math.min(nFat, 109)).map(i => buf.getInt(76 + 4 * i))
    val fat = difat.flatMap { s =>
      val off = 512 * (1 + s)
      (0 until 128).map(i => buf.getInt(off + 4 * i))
    }.toArray
    def chain(start: Int): Seq[Int] = {
      val out = mutable.ListBuffer.empty[Int]
      var s = start
      while (s >= 0 && s != -2 && out.size <= fat.length) { out += s; s = fat(s) }
      out.toList
    }
    def sectors(start: Int): Array[Byte] =
      chain(start).flatMap(s => data.slice(512 * (1 + s), 512 * (2 + s))).toArray

    val dir = sectors(dirStart)
    val dirBuf = le(dir)
    val entry = (0 until dir.length / 128).map(_ * 128).find { off =>
      val nameLen = dirBuf.getShort(off + 64) & 0xffff
      nameLen > 0 && new String(dir.slice(off, off + nameLen - 2), "UTF-16LE") == streamName
    }.getOrElse(throw new NoSuchElementException(s"no OLE2 stream '$streamName'"))
    val start = dirBuf.getInt(entry + 116)
    val size = dirBuf.getInt(entry + 120)
    if (size < 4096)
      throw new UnsupportedOperationException("mini-stream workbooks unsupported")
    sectors(start).take(size)
  }

  private def workbook(path: String): Array[Byte] = {
    val data = Files.readAllBytes(Paths.get(path))
    try oleStream(data, "Workbook")
    catch { case _: NoSuchElementException => oleStream(data, "Book") }
  }

  /** All records as (type, payloadOffset, length), in stream order. */
  private def records(wb: Array[Byte]): Seq[(Int, Int, Int)] = {
    val buf = le(wb)
    val out = mutable.ListBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i + 4 <= wb.length) {
      val t = buf.getShort(i) & 0xffff
      val l = buf.getShort(i + 2) & 0xffff
      out += ((t, i + 4, l))
      i += 4 + l
    }
    out.toList
  }

  /** Parse the shared string table, following CONTINUE records: each
    * continuation restarts with its own flags byte, so a string may
    * switch between compressed and utf-16 mid-way.
    */
  private def sharedStrings(wb: Array[Byte], recs: Seq[(Int, Int, Int)]): IndexedSeq[String] = {
    val buf = le(wb)
    val sstIdx = recs.indexWhere(_._1 == 0x00fc)
    if (sstIdx < 0) return IndexedSeq.empty
    // payload segments: SST + following CONTINUEs
    val segs = (recs(sstIdx) +: recs.drop(sstIdx + 1).takeWhile(_._1 == 0x003c))
      .map { case (_, off, len) => (off, len) }
    var seg = 0
    var pos = segs.head._1 + 8 // skip cstTotal/cstUnique
    def remaining = segs(seg)._1 + segs(seg)._2 - pos
    def advanceSeg(): Unit = { seg += 1; pos = segs(seg)._1 }
    def u8(): Int = { if (remaining == 0) advanceSeg(); val v = wb(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def u32(): Long = { val a = u16().toLong; val b = u16().toLong; a | (b << 16) }

    val unique = buf.getInt(segs.head._1 + 4)
    val out = mutable.ArrayBuffer.empty[String]
    var k = 0
    while (k < unique) {
      val cch = u16()
      var flags = u8()
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) u32() else 0L
      val sb = new StringBuilder
      var read = 0
      while (read < cch) {
        if (remaining == 0) { advanceSeg(); flags = u8() } // new grbit per CONTINUE
        if ((flags & 0x01) != 0) {
          val lo = u8(); val hi = u8()
          sb.append(((hi << 8) | lo).toChar)
        } else sb.append((u8() & 0xff).toChar)
        read += 1
      }
      var skip = 4L * cRun + cbExt
      while (skip > 0) { u8(); skip -= 1 }
      out += sb.toString
      k += 1
    }
    out.toIndexedSeq
  }

  private def rkValue(rk: Long): Double = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if (div100) v / 100 else v
  }

  def sheetNames(path: String): Seq[String] = boundSheets(workbook(path)).map(_._1)

  private def boundSheets(wb: Array[Byte]): Seq[(String, Int)] = {
    val buf = le(wb)
    records(wb).collect { case (0x0085, off, _) =>
      val sheetOff = buf.getInt(off)
      val nameLen = wb(off + 6) & 0xff
      val grbit = wb(off + 7) & 0xff
      val name =
        if ((grbit & 1) != 0)
          new String(wb.slice(off + 8, off + 8 + nameLen * 2), "UTF-16LE")
        else new String(wb.slice(off + 8, off + 8 + nameLen), "ISO-8859-1")
      (name, sheetOff)
    }
  }

  /** The named sheet as a padded row grid (numbers rendered compactly:
    * integral values without the trailing .0).
    */
  def readSheet(path: String, sheetName: String): Seq[Seq[String]] = {
    val wb = workbook(path)
    val buf = le(wb)
    val recs = records(wb)
    val sst = sharedStrings(wb, recs)
    val start = boundSheets(wb).find(_._1 == sheetName)
      .getOrElse(throw new NoSuchElementException(s"no sheet '$sheetName'"))._2

    def num(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

    val cells = mutable.Map.empty[(Int, Int), String]
    var i = start
    var first = true
    var done = false
    while (!done && i + 4 <= wb.length) {
      val t = buf.getShort(i) & 0xffff
      val l = buf.getShort(i + 2) & 0xffff
      val p = i + 4
      t match {
        case 0x000a if !first => done = true // EOF of this sheet substream
        case 0x00fd => // LABELSST
          val r = buf.getShort(p) & 0xffff; val c = buf.getShort(p + 2) & 0xffff
          val isst = buf.getInt(p + 6)
          cells((r, c)) = sst.lift(isst).getOrElse("")
        case 0x0204 => // LABEL (inline)
          val r = buf.getShort(p) & 0xffff; val c = buf.getShort(p + 2) & 0xffff
          val cch = buf.getShort(p + 6) & 0xffff
          val grbit = wb(p + 8) & 0xff
          cells((r, c)) =
            if ((grbit & 1) != 0) new String(wb.slice(p + 9, p + 9 + cch * 2), "UTF-16LE")
            else new String(wb.slice(p + 9, p + 9 + cch), "ISO-8859-1")
        case 0x0203 => // NUMBER
          val r = buf.getShort(p) & 0xffff; val c = buf.getShort(p + 2) & 0xffff
          cells((r, c)) = num(buf.getDouble(p + 6))
        case 0x027e => // RK
          val r = buf.getShort(p) & 0xffff; val c = buf.getShort(p + 2) & 0xffff
          cells((r, c)) = num(rkValue(buf.getInt(p + 6) & 0xffffffffL))
        case 0x00bd => // MULRK
          val r = buf.getShort(p) & 0xffff; val c0 = buf.getShort(p + 2) & 0xffff
          val n = (l - 6) / 6
          (0 until n).foreach { k =>
            cells((r, c0 + k)) = num(rkValue(buf.getInt(p + 4 + 6 * k + 2) & 0xffffffffL))
          }
        case _ => ()
      }
      first = false
      i += 4 + l
    }
    if (cells.isEmpty) return Seq.empty
    val maxR = cells.keys.map(_._1).max
    val maxC = cells.keys.map(_._2).max
    (0 to maxR).map(r => (0 to maxC).map(c => cells.getOrElse((r, c), "")))
  }
}
