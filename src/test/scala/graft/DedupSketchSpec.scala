package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions.{GraftFunctions => G}

/** Exactness boundaries of the SKETCH dedup families — the claims the
  * DuckDB-checkable degenerate twins (d19, d20) rest on, asserted
  * against in-Spark brute force where no SQL oracle can follow:
  *  - banded SimHash with bands > maxHamming is pigeonhole-EXACT
  *    (hamming ≤ bands−1 forces at least one untouched band, so the
  *    band join cannot miss a qualifying pair);
  *  - a TF-weighted SimHash is a function of the normalized token
  *    multiset (order-blind — the d19 oracle's multiset join key);
  *  - winnowing at w = 1 selects EVERY distinct char k-gram hash
  *    (d20's full-inventory premise), and real windows select subsets.
  */
class DedupSketchSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** documents ∪ exact-dup copies (%7, hamming 0 by construction) ∪
    * near-dup copies (%11, a few appended tokens — small but nonzero
    * hamming): the brute-force comparison set must contain pairs on
    * both sides of the maxHamming boundary to bite.
    */
  private lazy val corpus = {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    d.unionByName(
        d.filter(pmod($"doc_id", lit(7)) === 0)
          .select(($"doc_id" + 10000).as("doc_id"),
            concat(lit("  "), upper($"text"), lit("  ")).as("text")))
      .unionByName(
        d.filter(pmod($"doc_id", lit(11)) === 0)
          .select(($"doc_id" + 20000).as("doc_id"),
            concat($"text", lit(" graft appended marker tokens")).as("text")))
  }

  test("banding at maxHamming = bands-1 equals all-pairs brute force (pigeonhole)") {
    val banded = Dedup.simhashPairs(corpus, $"doc_id", $"text",
        bands = 4, maxHamming = 3)
      .select($"id1", $"id2", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    val sk = corpus.select($"doc_id", G.simhash64($"text").as("h")).cache()
    // brute force is test-only scaffolding — the cartesian is the point
    val brute = sk.select($"doc_id".as("id1"), $"h".as("h1"))
      .crossJoin(sk.select($"doc_id".as("id2"), $"h".as("h2")))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2",
        bit_count($"h1".bitwiseXOR($"h2")).cast("int").as("hamming"))
      .filter($"hamming" <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute,
      "bands=4/maxHamming=3 must lose no pair and add no pair vs brute force")
    assert(brute.exists(_._3 == 0), "corpus must contain hamming-0 planted pairs")
    sk.unpersist()
  }

  test("simhash is a function of the normalized token multiset (order-blind)") {
    // reverse token order + case/whitespace mutation: multiset identical
    val mutated = concat(lit("  "),
      upper(array_join(reverse(split(trim($"text"), "\\s+")), " ")), lit(" "))
    val diff = corpus
      .select(G.simhash64($"text").as("h1"), G.simhash64(mutated).as("h2"))
      .filter($"h1" =!= $"h2").count()
    assert(diff === 0)
  }

  test("winnow w=1 keeps every distinct char k-gram; w=4 selects a subset of it") {
    val checked = corpus.select(
        size(G.winnowFingerprint($"text", k = 8, w = 1)).as("n_w1"),
        size(array_distinct(Dedup.charShingles($"text", 8))).as("n_grams"),
        size(array_except(G.winnowFingerprint($"text", k = 8, w = 4),
          G.winnowFingerprint($"text", k = 8, w = 1))).as("escaped"),
        size(G.winnowFingerprint($"text", k = 8, w = 4)).as("n_w4"))
    val bad = checked.filter(
      $"n_w1" =!= $"n_grams" || $"escaped" > 0 || $"n_w4" > $"n_w1").count()
    assert(bad === 0,
      "w=1 must equal the distinct gram inventory and contain every w=4 selection")
    // real windows genuinely thin the set (not a vacuous subset claim)
    assert(checked.filter($"n_w4" < $"n_w1").count() > 0)
  }
}
