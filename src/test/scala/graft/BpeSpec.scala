package graft

import org.apache.spark.sql.functions._

/** The bracket-wrap replace-chain BPE encoding (t31) against
  * hand-computed merges: the classic `low/lower/lowest` example. Pins
  * the three properties the oracle can't isolate: merges chain onto
  * earlier merges' output, adjacent occurrences merge left-to-right,
  * and merges never cross a word boundary.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def encode(text: String, merges: Seq[(String, String)]): String = {
    val wrapped = regexp_replace(col("t"), "(\\S)", "($1)")
    val enc = merges.foldLeft(wrapped) { case (c, (a, b)) =>
      call_function("replace", c, lit(s"($a)($b)"), lit(s"($a$b)"))
    }
    Seq(text).toDF("t").select(enc).as[String].head()
  }

  test("merges chain: (l,o) then (lo,w) builds 'low' in two ranked steps") {
    val m = Seq("l" -> "o", "lo" -> "w", "e" -> "r")
    assert(encode("lower", m) == "(low)(er)")
    assert(encode("lowest", m) == "(low)(e)(s)(t)") // (e)(r) merge doesn't fire
  }

  test("adjacent occurrences merge left-to-right, BPE convention") {
    assert(encode("ooo", Seq("o" -> "o")) == "(oo)(o)")
    assert(encode("oooo", Seq("o" -> "o")) == "(oo)(oo)")
  }

  test("merges never cross a word boundary; token count = surviving '('") {
    val enc = encode("lo w", Seq("l" -> "o", "o" -> "w"))
    assert(enc == "(lo) (w)") // (o)(w) spans the space: must not fire
    val nTokens = enc.count(_ == '(')
    assert(nTokens == 2)
  }

  test("longer-symbol merges only fire on exact token pair, not substrings") {
    // token 'al' followed by 'o': pattern (l)(o) must NOT match inside (al)(o)
    val m = Seq("a" -> "l", "l" -> "o")
    assert(encode("alo", m) == "(al)(o)")
  }
}
