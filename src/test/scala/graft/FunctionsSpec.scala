package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BrOps, SafraOps, TextOps, UnitOps, SketchOps, VecOps}
import org.apache.spark.sql.types.Decimal

/** Pure-JVM unit tests for the expression implementations, mirroring the
  * reference's `tests/test_normalize/` semantics (golden cases stated
  * inline).
  */
class FunctionsSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)
  private def br(s: String): Option[BigDecimal] =
    Option(BrOps.parseBrDecimal(u(s))).map(_.toBigDecimal)

  test("parse_br_decimal: BR formats") {
    assert(br("1.234,56").contains(BigDecimal("1234.5600")))
    assert(br("1234,56").contains(BigDecimal("1234.5600")))
    assert(br("1234.56").contains(BigDecimal("1234.5600")))
    assert(br("R$ 142,50").contains(BigDecimal("142.5000")))
    assert(br("+0,5%").contains(BigDecimal("0.5000")))
    assert(br("-1.000,25").contains(BigDecimal("-1000.2500")))
    assert(br("12").contains(BigDecimal("12.0000")))
    // dot-only thousand grouping (BR integers, e.g. ANDA volumes)
    assert(br("3.699.769").contains(BigDecimal("3699769.0000")))
    assert(br("1.234").contains(BigDecimal("1234.0000")))
    // a 4-digit head is not a thousands group — stays a decimal point
    assert(br("1234.56").contains(BigDecimal("1234.5600")))
  }

  test("parse_br_decimal: junk is null") {
    assert(br("abc").isEmpty)
    assert(br("").isEmpty)
    assert(br("-").isEmpty)
    assert(br("12,34,56").isEmpty)
  }

  test("safra_of: Jul 1 boundary") {
    def d(s: String) = java.time.LocalDate.parse(s).toEpochDay.toInt
    assert(SafraOps.safraOf(d("2024-07-01")).toString == "2024/25")
    assert(SafraOps.safraOf(d("2024-06-30")).toString == "2023/24")
    assert(SafraOps.safraOf(d("1999-08-15")).toString == "1999/00")
  }

  test("normalize_safra: reference semantics") {
    def n(s: String) = Option(SafraOps.normalizeSafra(u(s))).map(_.toString)
    assert(n("2024/25").contains("2024/25"))
    assert(n("24/25").contains("2024/25"))
    assert(n("97/98").contains("1997/98"))   // century pivot at 50
    assert(n("2024/2025").contains("2024/25"))
    assert(n(" 2024 / 25 ").contains("2024/25"))
    assert(n("2024/26").contains("2024/26")) // complete form kept as-is
    assert(n("24-25").isEmpty)
    assert(n("safra").isEmpty)
  }

  test("convert_unit: exact decimal kg pivot") {
    def cv(v: String, f: String, t: String, p: String): Option[BigDecimal] =
      Option(UnitOps.convertUnit(Decimal(BigDecimal(v), 18, 4), u(f), u(t),
        if (p == null) null else u(p))).map(_.toBigDecimal)
    assert(cv("2", "sc60", "kg", null).contains(BigDecimal("120.0000")))
    assert(cv("1", "ton", "sc60", null).contains(BigDecimal("16.6667"))) // HALF_UP
    assert(cv("3", "ton", "sc60", null).contains(BigDecimal("50.0000")))
    assert(cv("2", "bushel", "kg", "milho").contains(BigDecimal("50.8024")))
    assert(cv("2", "bushel", "kg", "soja").contains(BigDecimal("54.4310")))
    assert(cv("4", "arroba", "kg", null).contains(BigDecimal("60.0000")))
    assert(cv("1", "parsec", "kg", null).isEmpty)
  }

  test("strip_accents: NFKD incl. ordinal indicators") {
    def sa(s: String) = TextOps.stripAccents(u(s)).toString
    assert(sa("São Paulo") == "Sao Paulo")
    assert(sa("açúcar") == "acucar")
    assert(sa("2ª safra") == "2a safra")
    assert(sa("plain ascii") == "plain ascii")
  }

  test("title_case_pt: small words stay lowercase") {
    def tc(s: String) = TextOps.titleCasePt(u(s)).toString
    assert(tc("vale do rio doce") == "Vale do Rio Doce")
    assert(tc("mogi das cruzes") == "Mogi das Cruzes")
    assert(tc("DE onde") == "De Onde") // first word always capitalized
  }

  test("normalize_ws: lowercase + collapse") {
    assert(TextOps.normalizeWs(u("  A   b\t c \n")).toString == "a b c")
  }

  test("nfc_normalize: composed == decomposed, idempotent, ascii identity") {
    def nfc(s: String) = TextOps.nfcNormalize(u(s)).toString
    val decomposed = "cafe\u0301 Sa\u0303o" // e/a + combining marks
    val composed = "caf\u00e9 S\u00e3o"     // single code points
    assert(nfc(decomposed) == composed)
    assert(nfc(composed) == composed)                 // already-NFC fast path
    assert(nfc(nfc(decomposed)) == nfc(decomposed))   // idempotent
    assert(nfc("plain ascii") == "plain ascii")
    // the dedup invariant: both spellings share one fingerprint after NFC
    assert(SketchOps.hash64(TextOps.nfcNormalize(u(decomposed)), 0L)
      == SketchOps.hash64(TextOps.nfcNormalize(u(composed)), 0L))
  }

  test("sketches: deterministic and near-dup sensitive") {
    val a = u("the quick brown fox jumps over the lazy dog again and again")
    val b = u("the quick brown fox jumps over the lazy dog again and again extra")
    val c = u("completely different content about spark query engines at scale")
    assert(SketchOps.hash64(a, 0L) == SketchOps.hash64(a, 0L))
    assert(SketchOps.hash64(a, 0L) != SketchOps.hash64(a, 1L))
    assert(SketchOps.simhash64(a) == SketchOps.simhash64(a))
    val hAB = SketchOps.hamming64(SketchOps.simhash64(a), SketchOps.simhash64(b))
    val hAC = SketchOps.hamming64(SketchOps.simhash64(a), SketchOps.simhash64(c))
    assert(hAB < hAC, s"near-dup hamming $hAB should be < unrelated $hAC")

    def sig(t: UTF8String) = {
      val arr = SketchOps.minhash(t, 3, 64, 42L)
      (0 until arr.numElements()).map(arr.getLong)
    }
    val agreeAB = sig(a).zip(sig(b)).count { case (x, y) => x == y }
    val agreeAC = sig(a).zip(sig(c)).count { case (x, y) => x == y }
    assert(agreeAB > 40, s"near-dups should agree on most minhashes, got $agreeAB/64")
    assert(agreeAC < 10, s"unrelated docs should rarely agree, got $agreeAC/64")

    val w1 = SketchOps.winnow(a, 8, 4)
    val w2 = SketchOps.winnow(a, 8, 4)
    assert((0 until w1.numElements()).map(w1.getLong) ==
      (0 until w2.numElements()).map(w2.getLong))
  }

  test("vec ops: cosine + hyperplane lsh") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Float*) = new GenericArrayData(xs.toArray)
    assert(math.abs(VecOps.cosine(arr(1f, 0f), arr(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(VecOps.cosine(arr(1f, 0f), arr(0f, 1f))) < 1e-12)
    assert(math.abs(VecOps.cosine(arr(1f, 2f), arr(2f, 4f)) - 1.0) < 1e-12)
    assert(VecOps.cosine(arr(0f, 0f), arr(1f, 1f)) == 0.0)
    // same vector -> same bucket; scaled vector -> same bucket (sign-invariant)
    val v = arr(0.5f, -1f, 2f, 0.1f)
    val v2 = arr(1f, -2f, 4f, 0.2f)
    assert(VecOps.hyperplaneLsh(v, 16, 42L) == VecOps.hyperplaneLsh(v2, 16, 42L))
  }
}
