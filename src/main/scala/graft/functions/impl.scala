package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.text.Normalizer

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Static (Java-callable) implementations backing the custom Catalyst
  * expressions in [[graft.functions]]. Keeping these as top-level objects
  * gives them static forwarders, so generated (whole-stage codegen) Java
  * can call them directly — no reflection, no closures, no UDF overhead.
  *
  * Semantics follow the reference engine's normalization layer
  * (agrobr `normalize/` modules, `cepea/parsers/v1.py`) re-expressed from
  * scratch; see Scaladoc on each method.
  */
object TextOps {

  /** Unicode NFC canonical composition — the dedup-preprocessing twin
    * of [[stripAccents]] that KEEPS the accents: visually identical
    * strings with composed vs decomposed code points must fingerprint
    * identically, or every exact-dedup and n-gram pipeline silently
    * treats them as distinct documents. ASCII fast path skips the
    * normalizer entirely (the overwhelmingly common case).
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    var needs = false
    var i = 0
    while (i < str.length && !needs) { if (str.charAt(i) >= 0x80) needs = true; i += 1 }
    if (!needs) return s
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFKD-normalize and drop combining marks (reference:
    * `normalize/crops.py:6-8`, `normalize/regions.py:78-80`).
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var needs = false
    var i = 0
    while (i < str.length && !needs) { if (str.charAt(i) >= 0x80) needs = true; i += 1 }
    if (!needs) return s
    val norm = Normalizer.normalize(str, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(norm.length)
    i = 0
    while (i < norm.length) {
      val ch = norm.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Lowercase + collapse runs of whitespace to single spaces + trim.
    * Canonical form used for exact-dup fingerprints.
    */
  def normalizeWs(s: UTF8String): UTF8String = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    var pendingSpace = false
    while (i < str.length) {
      val ch = str.charAt(i)
      if (Character.isWhitespace(ch)) { if (sb.length() > 0) pendingSpace = true }
      else { if (pendingSpace) { sb.append(' '); pendingSpace = false }; sb.append(ch) }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Deflate compression ratio (compressed bytes / raw bytes, zlib
    * level 6, raw stream): the Gopher/CCNet-family quality signal —
    * boilerplate and template spam compress far below natural prose.
    * Only the compressed LENGTH is kept (the output buffer is reused
    * for counting), so the expression allocates one fixed 8 KiB
    * scratch per call and never materializes the compressed payload.
    * Empty input ratio is defined as 1.0.
    */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n.toDouble / raw.length
    } finally d.end()
  }

  /** Portuguese-aware title case: capitalize words except small words
    * (de, da, do, das, dos, e) unless first (reference:
    * `normalize/regions.py:133-149`; plain `initcap` is wrong there).
    */
  def titleCasePt(s: UTF8String): UTF8String = {
    val small = Set("de", "da", "do", "das", "dos", "e", "d")
    val words = s.toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out = words.iterator.zipWithIndex.map { case (w, i) =>
      if (w.isEmpty) w
      else if (i > 0 && small.contains(w)) w
      else w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + w.substring(1)
    }.mkString(" ")
    UTF8String.fromString(out)
  }
}

object BrOps {
  private val mc = new MathContext(38, RoundingMode.HALF_UP)

  /** Parse a Brazilian-formatted decimal: strips currency symbol, spaces,
    * percent sign; `1.234,56` -> 1234.56; lone comma acts as decimal
    * point; preserves sign. Returns null when unparseable. (Reference
    * semantics: `cepea/parsers/v1.py:236-255`, `b3/models.py:84-89` —
    * the positivity filter there is left to the sanity validators.)
    */
  def parseBrDecimal(s: UTF8String): Decimal = {
    if (s == null) return null
    var str = s.toString.trim
    if (str.isEmpty) return null
    // strip currency / percent / spaces (incl. nbsp)
    str = str.replace("R$", "").replace("%", "").replace(" ", " ").trim
    str = str.replace(" ", "")
    if (str.isEmpty || str == "-") return null
    val neg = str.startsWith("-")
    if (neg || str.startsWith("+")) str = str.substring(1)
    val hasComma = str.indexOf(',') >= 0
    val hasDot = str.indexOf('.') >= 0
    val canonical =
      if (hasComma && hasDot) str.replace(".", "").replace(',', '.') // 1.234,56
      else if (hasComma) str.replace(',', '.')                      // 1234,56
      // dot-only thousand grouping ("3.699.769") — BR integers
      else if (hasDot && str.matches("\\d{1,3}(\\.\\d{3})+")) str.replace(".", "")
      else str                                                      // 1234.56 or 1234
    try {
      var bd = new JBigDecimal(canonical, mc)
      if (neg) bd = bd.negate()
      bd = bd.setScale(4, RoundingMode.HALF_UP)
      Decimal.apply(bd, 18, 4)
    } catch { case _: NumberFormatException => null }
  }
}

object SafraOps {

  /** Harvest-year of a date: the safra "2024/25" starts Jul 1 2024 and
    * ends Jun 30 2025 (reference: `dates.py:15-25,106-112`).
    */
  def safraOf(daysSinceEpoch: Int): UTF8String = {
    val d = java.time.LocalDate.ofEpochDay(daysSinceEpoch.toLong)
    val y = if (d.getMonthValue >= 7) d.getYear else d.getYear - 1
    UTF8String.fromString(f"$y%04d/${(y + 1) % 100}%02d")
  }

  /** Normalize safra spellings (reference: `dates.py:36-56`): collapse
    * spaces around the slash; "2024/25" kept as-is; "24/25" gets a
    * century pivot at 50 (>=50 -> 1900s, else 2000s); "2024/2025" keeps
    * the last two end digits. Null on anything unrecognizable (the
    * reference raises ValueError there).
    */
  def normalizeSafra(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString.trim.replaceAll("\\s*/\\s*", "/")
    val completa = "^(\\d{4})/(\\d{2})$".r
    val curta = "^(\\d{2})/(\\d{2})$".r
    val barra = "^(\\d{4})/(\\d{4})$".r
    str match {
      case completa(_, _) => UTF8String.fromString(str)
      case curta(y, e) =>
        val y2 = y.toInt
        val y1 = if (y2 >= 50) 1900 + y2 else 2000 + y2
        UTF8String.fromString(s"$y1/$e")
      case barra(y, e) => UTF8String.fromString(s"$y/${e.substring(2)}")
      case _ => null
    }
  }
}

object UnitOps {
  private val mc = new MathContext(38, RoundingMode.HALF_UP)

  /** kg per unit; bushel is product-specific (reference factor table:
    * `normalize/units.py:25-66` — exact decimal factors, kg pivot).
    */
  private def kgPerUnit(unit: String, produto: String): JBigDecimal = unit match {
    case "kg"      => JBigDecimal.ONE
    case "ton" | "t" => new JBigDecimal("1000")
    case "mil_ton" => new JBigDecimal("1000000")
    case "sc60" | "sc60kg" => new JBigDecimal("60")
    case "sc50" | "sc50kg" => new JBigDecimal("50")
    case "sc40" | "sc40kg" => new JBigDecimal("40")
    case "arroba" | "@" => new JBigDecimal("15")
    case "lb" => new JBigDecimal("0.45359237")
    case "bushel" | "bu" => produto match {
      case "milho" | "corn"          => new JBigDecimal("25.4012")
      case "soja" | "soybean" | null => new JBigDecimal("27.2155")
      case "trigo" | "wheat"         => new JBigDecimal("27.2155")
      case _                         => new JBigDecimal("27.2155")
    }
    case _ => null
  }

  /** Convert a quantity between units through the kg pivot; exact decimal
    * arithmetic, result scale 4 HALF_UP. Null for unknown units.
    */
  def convertUnit(value: Decimal, from: UTF8String, to: UTF8String, produto: UTF8String): Decimal = {
    if (value == null || from == null || to == null) return null
    val p = if (produto == null) null else produto.toString
    val f = kgPerUnit(from.toString, p)
    val t = kgPerUnit(to.toString, p)
    if (f == null || t == null) return null
    val r = value.toJavaBigDecimal.multiply(f, mc).divide(t, 4, RoundingMode.HALF_UP)
    Decimal.apply(r, 18, 4)
  }
}

/** Deterministic 64-bit hashing + text sketches (SimHash, MinHash,
  * winnowing fingerprints). Algorithms are the published ones
  * (Charikar 2002 SimHash; Broder 1997 MinHash; Schleimer et al. 2003
  * winnowing); hash mixer is splitmix64 (Steele et al. 2014).
  */
object SketchOps {

  /** splitmix64 finalizer — stable across JVMs/runs. */
  def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then mixed — deterministic token hash. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  private def tokens(text: UTF8String): Array[String] =
    TextOps.normalizeWs(text).toString.split(" ").filter(_.nonEmpty)

  /** 64-bit SimHash over whitespace tokens (term-frequency weighted). */
  def simhash64(text: UTF8String): Long = {
    val ts = tokens(text)
    val acc = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = hash64(UTF8String.fromString(ts(i)), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** MinHash signature over word k-shingles: n independent permutations
    * via seed-mixed splitmix64. Empty/short docs get Long.MaxValue sig.
    */
  def minhash(text: UTF8String, shingleSize: Int, numHashes: Int, seed: Long): ArrayData = {
    val ts = tokens(text)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (ts.length >= shingleSize) {
      var i = 0
      while (i + shingleSize <= ts.length) {
        val sh = ts.slice(i, i + shingleSize).mkString(" ")
        val base = hash64(UTF8String.fromString(sh), seed)
        var j = 0
        while (j < numHashes) {
          val h = mix64(base ^ (j.toLong * 0x9e3779b97f4a7c15L))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Winnowing fingerprint: character k-gram rolling hashes, minimum per
    * window of w, distinct + sorted for a canonical Array[Long].
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = TextOps.normalizeWs(text).toString
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    // polynomial rolling hash base 257 mod 2^61-1, then mixed
    val MOD = (1L << 61) - 1
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = mulMod(pow, B, MOD); i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (mulMod(h, B, MOD) + s.charAt(i)) % MOD; i += 1 }
    hs(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h - mulMod(s.charAt(i - 1), pow, MOD) % MOD + MOD) % MOD
      h = (mulMod(h, B, MOD) + s.charAt(i + k - 1)) % MOD
      hs(i) = mix64(h)
      i += 1
    }
    val sel = scala.collection.mutable.TreeSet.empty[Long]
    if (n <= w) { var m = hs(0); i = 1; while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }; sel += m }
    else {
      i = 0
      while (i + w <= n) {
        var m = hs(i)
        var j = i + 1
        while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
        sel += m
        i += 1
      }
    }
    new GenericArrayData(sel.toArray)
  }

  /** 128-bit mulmod specialized to m = 2^61-1 (2^64 ≡ 8, 2^61 ≡ 1 mod m). */
  private def mulMod(a: Long, b: Long, m: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b) // a,b < 2^61 => hi < 2^58
    val lo = a * b
    val mask = (1L << 61) - 1
    var r = (lo & mask) + (lo >>> 61) + (hi << 3)
    while (r >= m) r -= m
    r
  }
}

object VecOps {

  /** Cosine similarity of two float vectors, accumulated in double in
    * index order (deterministic). Null-safe at the Expression layer.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }


  def norm(a: ArrayData): Double = math.sqrt(dot(a, a))

  /** L2-normalize a DOUBLE vector — the fused, codegen-callable form of
    * the three-step Catalyst chain
    *   nrm = sqrt(aggregate(v, 0.0d, (a, x) => a + x * x))
    *   filter(nrm > 0)
    *   transform(v, x => x / nrm)
    * with bit-identical arithmetic: the squared sum accumulates in index
    * order exactly like the fold (acc + x*x per step), and each output
    * element is the same single division x / nrm. Returns NULL exactly
    * where the chain's filter dropped the row — a zero vector (nrm == 0)
    * or any NaN element (nrm == NaN, and !(NaN > 0)) — so
    * `isNotNull` on the result IS the old filter.
    */
  def l2normalize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var ssq = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); out(i) = x; ssq += x * x; i += 1 }
    val nrm = math.sqrt(ssq)
    if (!(nrm > 0)) null
    else {
      var j = 0
      while (j < n) { out(j) = out(j) / nrm; j += 1 }
      new GenericArrayData(out)
    }
  }

  /** [[l2normalize]] for a FLOAT vector whose fold squared in FLOAT —
    * Catalyst types `x * x` over float elements as a float multiply and
    * only widens for the double accumulate, so
    * `aggregate(v, 0.0d, (a, x) => a + x * x)` over `array<float>` adds
    * FLOAT-rounded squares. This variant reproduces that exactly
    * (float multiply, then widen); output elements are
    * `x.toDouble / nrm`, matching `element_at(v, i) / nrm` (float
    * widened by the divide's coercion). NULL where `nrm > 0` fails.
    */
  def l2normalizeF(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var ssq = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i)
      out(i) = x.toDouble
      ssq += (x * x).toDouble
      i += 1
    }
    val nrm = math.sqrt(ssq)
    if (!(nrm > 0)) null
    else {
      var j = 0
      while (j < n) { out(j) = out(j) / nrm; j += 1 }
      new GenericArrayData(out)
    }
  }

  /** The repo's exact-6-dp aggregation term as an UNSCALED LONG:
    * the bit-faithful fusion of `round(x, 6).cast(DecimalType(28, 6))`
    * into the integer 10^6·round(x, 6), so the surrounding `sum(...)`
    * runs on primitive longs instead of Decimal (the Decimal add +
    * unsafe-row decimal writes dominated the trainer passes — a28/a29
    * spent ~9 s CPU per 64-column pass on them at sf0.1).
    *
    * Mirrors the two-step chain EXACTLY, intermediate double included:
    *   r = BigDecimal.valueOf(x).setScale(6, HALF_UP).doubleValue()
    *       — Spark's Round(x, 6) on a finite double
    *   u = BigDecimal.valueOf(r).setScale(6, HALF_UP) ·10^6
    *       — Spark's Cast(r as DECIMAL(p, 6)): valueOf is the shortest
    *         decimal repr, setScale the cast's HALF_UP re-round (a no-op
    *         until |r| has >~16 significant digits, where the two-step
    *         chain's re-round is exactly what this reproduces)
    * Callers map NaN/Inf to NULL themselves (the cast's behavior; Round
    * passes them through). Diverges from the cast only in overflow
    * style: past the long range (|x| ≥ ~9.2e12) this THROWS
    * (longValueExact) where the cast nulls at 1e22 — losing a gradient
    * term silently corrupts a trained model, so loud is correct.
    */
  def round6ScaledLong(x: Double): Long = {
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    java.math.BigDecimal.valueOf(r)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()
  }

  /** Deterministic hyperplane components for (seed, nbits, dim), cached
    * per JVM so the per-row cost is a pure dot product — the derivation
    * (splitmix64 -> uniform ~[-1,1)) runs once per executor, not per row.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def planes(seed: Long, nbits: Int, d: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, nbits, d), { _ =>
      val arr = new Array[Double](nbits * d)
      var b = 0
      while (b < nbits) {
        var i = 0
        while (i < d) {
          val h = SketchOps.mix64(seed ^ (b.toLong << 32) ^ i.toLong)
          arr(b * d + i) = h.toDouble / Long.MaxValue.toDouble
          i += 1
        }
        b += 1
      }
      arr
    })

  /** Sign pattern of `nbits` random-hyperplane projections (seeded) —
    * LSH bucket id for cosine similarity (Charikar 2002); deterministic
    * across executors.
    */
  def hyperplaneLsh(a: ArrayData, nbits: Int, seed: Long): Long = {
    val d = a.numElements()
    val p = planes(seed, nbits, d)
    var sig = 0L
    var b = 0
    while (b < nbits) {
      var s = 0.0
      var i = 0
      val off = b * d
      while (i < d) { s += p(off + i) * a.getFloat(i); i += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Dependency-free binary media-header parsing — the ingestion stance
  * the PDF/XLSX/BIFF readers established, applied to image payloads:
  * dimensions come straight off the container's fixed header layout
  * (PNG IHDR big-endian, GIF/BMP little-endian), no codec library.
  * Used by the `media_dims` expression; anything unrecognized or
  * truncated is null, never a throw (corrupt payloads are data, not
  * errors, at corpus scale).
  */
object MediaOps {
  import org.apache.spark.unsafe.types.UTF8String

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** `"<fmt>:<width>x<height>"` for PNG/GIF/BMP payloads, else null. */
  def mediaDims(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return UTF8String.fromString(s"png:${be32(b, 16)}x${be32(b, 20)}")
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return UTF8String.fromString(s"gif:${le16(b, 6)}x${le16(b, 8)}")
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return UTF8String.fromString(
        s"bmp:${le32(b, 18)}x${math.abs(le32(b, 22).toInt)}")
    null
  }
}
