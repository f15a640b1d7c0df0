package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** The bloom filter's two probe forms and its incremental-union
  * algebra. The JVM twin ([[Bloom.Filter.mightContainString]]) exists
  * so per-gram row paths (the curation gate's HOF lambda) avoid the
  * interpreted-literal pathology; its contract is BIT-FOR-BIT equality
  * with the Column form, pinned here over members and absentees. The
  * union algebra (empty ∪ build == build; union idempotent) is what
  * makes the streaming-maintained corpus bloom replay-safe without
  * batch-id bookkeeping.
  */
class BloomFilterSpec extends SparkSuite {
  import spark.implicits._

  private val members  = (0 until 500).map(i => s"member_$i")
  private val absentees = (0 until 500).map(i => s"absent_$i")

  test("JVM twin equals the Column probe on every member and absentee") {
    val f = Bloom.build(members.toDF("k"), "k", nRows = members.size)
    // no false negatives, in both forms
    assert(members.forall(f.mightContainString))
    val colMembers = members.toDF("k")
      .filter(f.mightContain(col("k"))).as[String].collect().toSet
    assert(colMembers == members.toSet)
    // absentees: the two forms must agree key-by-key (false positives
    // allowed, DISAGREEMENT is not — the twin must probe the same bits)
    val colHits = absentees.toDF("k")
      .filter(f.mightContain(col("k"))).as[String].collect().toSet
    val jvmHits = absentees.filter(f.mightContainString).toSet
    assert(jvmHits == colHits)
    // and at 10 bits/row the absentee FP count stays near the ~1% design point
    assert(jvmHits.size <= 25, s"FP rate blew the design bound: $jvmHits")
  }

  test("union algebra: empty∪build == build, re-union is a no-op, growth is monotone") {
    val direct = Bloom.build(members.toDF("k"), "k", nRows = members.size)
    val viaEmpty = Bloom.union(
      Bloom.empty(direct.mBits, direct.k), members.toDF("k"), "k")
    assert(viaEmpty.words.sameElements(direct.words))
    // idempotent: absorbing the same batch twice changes nothing —
    // the property that makes crash-replay maintenance safe
    val again = Bloom.union(viaEmpty, members.toDF("k"), "k")
    assert(again.words.sameElements(viaEmpty.words))
    // monotone: a second batch only ever sets bits
    val grown = Bloom.union(viaEmpty, absentees.toDF("k"), "k")
    assert(viaEmpty.words.zip(grown.words).forall {
      case (before, after) => (before & ~after) == 0L
    })
    assert(absentees.forall(grown.mightContainString))
  }

  test("sizeFor doubles to the FP target and hard-caps at RegenMaxBits") {
    // ordinary regen: doubled geometry meets the target
    val m = Bloom.sizeFor(n = 1000000L, targetFp = 0.01, fromBits = 1L << 20)
    assert(m > (1L << 20) && m <= Bloom.RegenMaxBits)
    assert(Bloom.predictedFp(m, 5, 1000000L) <= 0.01)
    // power-of-two discipline (bit positions depend on mBits)
    assert(java.lang.Long.bitCount(m) == 1)
    // a key count no single broadcastable filter can serve caps at
    // RegenMaxBits (16 MiB) instead of growing into an unbroadcastable
    // word table — correctness is unaffected (hotter bloom = more FP
    // suspects into the exact join), the caller is told to shard
    assert(Bloom.sizeFor(n = Long.MaxValue, targetFp = 0.01,
      fromBits = 1L << 20) == Bloom.RegenMaxBits)
    assert(Bloom.sizeFor(n = 1L << 40, targetFp = 0.01,
      fromBits = Bloom.RegenMaxBits) == Bloom.RegenMaxBits)
  }
}
