package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.Decimal
import graft.functions.{BrOps, SafraOps, SketchOps, TextOps, UnitOps}

/** Property-based coverage of the scalar functions: round-trips,
  * idempotence and invariants over generated inputs (ScalaCheck native
  * runner).
  */
object FunctionProperties extends Properties("graft.functions") {

  private def u(s: String) = UTF8String.fromString(s)

  property("parse_br_decimal inverts BR formatting for any cents") =
    forAll(Gen.chooseNum(-999999999L, 999999999L)) { cents =>
      val sign = if (cents < 0) "-" else ""
      val abs = math.abs(cents)
      val grouped = f"${abs / 100}%,d".replace(",", ".")
      val br = f"$sign$grouped,${abs % 100}%02d"
      val parsed = BrOps.parseBrDecimal(u(br))
      parsed != null && parsed.toBigDecimal == BigDecimal(cents) / 100
    }

  property("normalize_safra is idempotent") =
    forAll(Gen.chooseNum(1950, 2049)) { y =>
      val once = SafraOps.normalizeSafra(u(f"${y % 100}%02d/${(y + 1) % 100}%02d"))
      once != null &&
        SafraOps.normalizeSafra(once).toString == once.toString
    }

  property("safra_of respects the Jul-1 boundary") =
    forAll(Gen.chooseNum(0, 40000)) { epochDay =>
      val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
      val safra = SafraOps.safraOf(epochDay).toString
      val startYear = safra.take(4).toInt
      val expected = if (d.getMonthValue >= 7) d.getYear else d.getYear - 1
      startYear == expected && safra.matches("\\d{4}/\\d{2}")
    }

  property("convert_unit round-trips through kg") =
    forAll(Gen.chooseNum(1, 100000),
      Gen.oneOf("sc60", "sc50", "sc40", "ton", "arroba")) { (v, unit) =>
      val d = Decimal(BigDecimal(v), 18, 4)
      val toKg = UnitOps.convertUnit(d, u(unit), u("kg"), null)
      val back = UnitOps.convertUnit(toKg, u("kg"), u(unit), null)
      back.toBigDecimal == d.toBigDecimal
    }

  property("normalize_ws idempotent; strip_accents fixes ASCII") =
    forAll(Gen.asciiPrintableStr) { s =>
      val once = TextOps.normalizeWs(u(s)).toString
      TextOps.normalizeWs(u(once)).toString == once &&
        TextOps.stripAccents(u(once)).toString == once
    }

  property("hash64 stable and seed-sensitive") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      SketchOps.hash64(u(s), 1L) == SketchOps.hash64(u(s), 1L) &&
        SketchOps.hash64(u(s), 1L) != SketchOps.hash64(u(s), 2L)
    }

  property("minhash agreement estimates shingle jaccard within 4 sigma") =
    forAll(Gen.chooseNum(5, 30), Gen.chooseNum(0, 30), Gen.chooseNum(1L, 1000L)) {
      (nShared, nExtra, seed) =>
        // two docs: a shared token run plus a disjoint tail on one side
        val rnd = new scala.util.Random(seed)
        def tok() = "w" + rnd.nextInt(100000)
        val shared = Seq.fill(nShared + 2)(tok())
        val extra = Seq.fill(nExtra)(tok())
        val a = shared.mkString(" ")
        val b = (shared ++ extra).mkString(" ")
        def sh(words: Seq[String]) =
          words.sliding(3).map(_.mkString(" ")).toSet
        val sa = sh(shared)
        val sb = sh(shared ++ extra)
        val jaccard = (sa & sb).size.toDouble / (sa | sb).size
        def sig(t: String) = {
          val arr = SketchOps.minhash(u(t), 3, 64, 42L)
          (0 until arr.numElements()).map(arr.getLong)
        }
        val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 64.0
        // sigma = sqrt(J(1-J)/64) <= 0.0625; allow 4 sigma + slack
        math.abs(est - jaccard) <= 0.3
    }

  property("simhash hamming identities") =
    forAll(Gen.listOfN(20, Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val h = SketchOps.simhash64(u(words.mkString(" ")))
      SketchOps.hamming64(h, h) == 0 && SketchOps.hamming64(h, ~h) == 64
    }

  property("deflate ratio: positive, deterministic, repetition compresses harder") =
    forAll(Gen.asciiPrintableStr.suchThat(_.length >= 10)) { s =>
      val r1 = TextOps.deflateRatio(u(s))
      val rep = TextOps.deflateRatio(u(s * 50))
      r1 > 0.0 && r1 == TextOps.deflateRatio(u(s)) && rep <= r1
    }
}
