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

  // ---- KLL quantile sketch (buffer-level laws) ----

  private val doubleList = Gen.chooseNum(1, 400)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))

  property("kll exact regime equals rank selection for any input") =
    forAll(doubleList) { vs =>
      val buf = new graft.functions.KllBuffer(512)
      vs.foreach(buf.add)
      val sorted = vs.sorted
      Seq(0.0, 0.25, 0.5, 0.75, 1.0).forall { p =>
        val target = math.max(1L, math.ceil(p * vs.length).toLong)
        buf.quantiles(Seq(p))(0) == sorted((target - 1).toInt)
      }
    }

  property("kll merge == concat in the exact regime, for any split point") =
    forAll(doubleList, Gen.chooseNum(0.0, 1.0)) { (vs, cut) =>
      val at = (vs.length * cut).toInt
      val (l, r) = vs.splitAt(at)
      val a = new graft.functions.KllBuffer(1024); l.foreach(a.add)
      val b = new graft.functions.KllBuffer(1024); r.foreach(b.add)
      a.merge(b)
      val whole = new graft.functions.KllBuffer(1024); vs.foreach(whole.add)
      a.quantiles(Seq(0.25, 0.5, 0.75)).toSeq ==
        whole.quantiles(Seq(0.25, 0.5, 0.75)).toSeq
    }

  property("kll sketchy regime: median rank error bounded for any input") =
    forAll(Gen.listOfN(5000, Gen.chooseNum(-1e9, 1e9))) { vs =>
      val buf = new graft.functions.KllBuffer(128)
      vs.foreach(buf.add)
      val est = buf.quantiles(Seq(0.5))(0)
      val sorted = vs.sorted
      val rank = sorted.count(_ <= est)
      math.abs(rank - vs.length / 2.0) <= 0.1 * vs.length
    }

  // ---- topk_by buffer laws ----

  private val topkRows = Gen.chooseNum(0, 200).flatMap(n =>
    Gen.listOfN(n, Gen.zip(Gen.chooseNum(0.0, 50.0), Gen.chooseNum(0L, 1000L))))

  property("topk buffer == sort-take(k) for any input and k") =
    forAll(topkRows, Gen.chooseNum(1, 12)) { (rows, k) =>
      val buf = new graft.functions.TopKBuffer(k)
      rows.foreach { case (o, t) => buf.add(o, t, null) }
      val expect = rows.distinct.sortBy { case (o, t) => (-o, t) }.take(k)
      // distinct because equal (ord, tie) pairs are interchangeable
      val got = buf.sorted.toSeq.map { case (o, t, _) => (o, t) }
      got.size == math.min(k, rows.size) &&
        got.filterNot(rows.contains).isEmpty &&
        (rows.distinct.size < rows.size || got == expect)
    }

  property("topk buffer merge == one buffer over the concat") =
    forAll(topkRows, topkRows, Gen.chooseNum(1, 8)) { (l, r, k) =>
      val a = new graft.functions.TopKBuffer(k)
      l.foreach { case (o, t) => a.add(o, t, null) }
      val b = new graft.functions.TopKBuffer(k)
      r.foreach { case (o, t) => b.add(o, t, null) }
      a.merge(b)
      val whole = new graft.functions.TopKBuffer(k)
      (l ++ r).foreach { case (o, t) => whole.add(o, t, null) }
      a.sorted.toSeq.map(x => (x._1, x._2)) ==
        whole.sorted.toSeq.map(x => (x._1, x._2))
    }
}
