package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleUp

/** The scale-proof substrate is only as good as its invariants: the
  * per-replica cipher must preserve LENGTH (n_chars stays true) and
  * within-replica similarity EXACTLY (it is a bijection on the
  * alphabet, so shingle sets map 1:1), while making cross-replica
  * shingles disjoint (so similarity joins scale linearly, not
  * quadratically). Pure-function tests — the Spark-side row-count
  * invariants are asserted by ScaleUp.main itself at generation time.
  */
class ScaleUpSpec extends AnyFunSuite {

  private def shingles(s: String, k: Int = 3): Set[String] =
    s.sliding(k).toSet

  test("replica 0 is the identity") {
    val s = "Soja em Alta 123, 北京 text!"
    assert(ScaleUp.cipher(s, 0) eq s)
  }

  test("cipher preserves length and non-letter characters") {
    val s = "Abc xyz, 123 -- ação 北京!"
    for (r <- 1 to 9) {
      val c = ScaleUp.cipher(s, r)
      assert(c.length == s.length)
      // digits, punctuation, whitespace, accented chars untouched
      assert(c.zip(s).forall { case (cc, sc) =>
        if (sc.isDigit || sc == ' ' || sc == ',' || sc == '-' || sc == '!' ||
          sc == 'ç' || sc == 'ã') cc == sc else true
      })
    }
  }

  test("cipher is a bijection on the rotated alphabets: within-replica similarity exact") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cat"
    val jacBase = {
      val (x, y) = (shingles(a), shingles(b))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    for (r <- 1 to 9) {
      val (x, y) = (shingles(ScaleUp.cipher(a, r)), shingles(ScaleUp.cipher(b, r)))
      val jac = x.intersect(y).size.toDouble / x.union(y).size
      assert(math.abs(jac - jacBase) < 1e-12,
        s"replica $r must preserve pairwise Jaccard exactly")
    }
  }

  test("cross-replica shingles are disjoint for letter text (linear, not quadratic, pair growth)") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    for (r <- 1 to 9; q <- 0 until r) {
      val x = shingles(ScaleUp.cipher(a, r)).filter(_.forall(_.isLetter))
      val y = shingles(ScaleUp.cipher(a, q)).filter(_.forall(_.isLetter))
      assert(x.intersect(y).isEmpty, s"replicas $q/$r share letter shingles")
    }
  }

  test("letter maps are pairwise distinct across 100 replicas (factor-100 substrate)") {
    // past r = 25 the map is affine (a != 1); a plain rotation would
    // collapse replicas r and r+26 onto identical text — the exact
    // failure that made similarity rows ineligible for a ×100 step
    val s = "the quick brown fox jumps over the lazy dog"
    val outs = (0 until 100).map(r => ScaleUp.cipher(s, r))
    assert(outs.distinct.size == 100, "every replica must carry distinct text")
  }

  test("cross-replica letter-shingle overlap stays far below near-dup range for 100 replicas") {
    val s = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val shin = (0 until 100).map(r =>
      shingles(ScaleUp.cipher(s, r)).filter(_.forall(_.isLetter)))
    var worst = 0.0
    for (r <- 0 until 100; q <- 0 until r) {
      val jac = shin(r).intersect(shin(q)).size.toDouble /
        shin(r).union(shin(q)).size
      worst = math.max(worst, jac)
    }
    // distinct affine maps can coincide on isolated shingles, but any
    // pair of replicas must stay an order of magnitude below every
    // similarity threshold the dedup family uses (>= 0.5)
    assert(worst < 0.05, f"worst cross-replica Jaccard $worst%.3f")
  }

  test("CJK block rotates inside its own range and stays bijective") {
    val s = "北京上海广州深圳"
    for (r <- 1 to 9) {
      val c = ScaleUp.cipher(s, r)
      assert(c != s)
      assert(c.forall(ch => ch >= 0x4E00 && ch <= 0x9FFF))
      assert(c.toSet.size == s.toSet.size) // injective on the sample
      // different replicas land on different codepoints
      for (q <- 1 until r) assert(ScaleUp.cipher(s, q) != c)
    }
  }
}
