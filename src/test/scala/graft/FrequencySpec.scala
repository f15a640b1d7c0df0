package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.ops.Frequency

/** Misra-Gries heavy hitters: the candidate pass may over-generate but
  * must NEVER lose a true heavy hitter (the mergeable-summaries
  * guarantee), and the recounted output must equal the brute-force
  * groupBy answer exactly.
  */
class FrequencySpec extends SparkSuite with TableDrivenPropertyChecks {
  import spark.implicits._

  private def bruteForce(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, f) => f * (k + 1) > n }.toMap
  }

  test("exact equality with brute force on a skewed corpus, several k") {
    val rng = new scala.util.Random(7)
    // zipf-ish skew: item i drawn with weight ~ 1/(i+1)
    val universe = (0 until 400).map(i => s"w$i")
    val weights = universe.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val items = Seq.fill(20000) {
      val x = rng.nextDouble() * total
      universe(cum.indexWhere(x <= _))
    }
    val df = items.toDF("token").repartition(8)
    forAll(Table("k", 9, 49, 199)) { k =>
      val got = Frequency.heavyHitters(df, "token", k)
        .as[(String, Long)].collect().toMap
      assert(got == bruteForce(items, k))
    }
  }

  test("candidate pass is bounded by k per partition and never loses a heavy hitter") {
    val rng = new scala.util.Random(11)
    val items = Seq.fill(5000)(s"t${rng.nextInt(1000)}") ++ Seq.fill(800)("planted")
    val df = items.toDF("token").repartition(4)
    val k = 19
    val cands = Frequency.mgCandidates(df, "token", k)
    assert(cands.count() <= 4L * k, "more than k survivors in some partition")
    // planted is ~13.8% of the stream >> 1/(k+1) = 5% -> must survive
    assert(cands.filter($"token" === "planted").count() >= 1)
    val hh = Frequency.heavyHitters(df, "token", k).as[(String, Long)].collect().toMap
    assert(hh("planted") == 800L)
  }

  test("no heavy hitters -> empty result (uniform stream, tight threshold)") {
    val items = (0 until 10000).map(i => s"u${i % 500}") // every freq = 20 = N/500
    val df = items.toDF("token").repartition(8)
    // threshold freq*(k+1) > N with k=499 -> 20*500 > 10000 is false: empty
    assert(Frequency.heavyHitters(df, "token", 499).count() == 0)
  }
}
