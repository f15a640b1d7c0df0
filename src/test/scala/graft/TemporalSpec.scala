package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** Randomized equivalence of the temporal-join compositions against
  * driver-side brute force — q30/q31 pin them to DuckDB on one
  * dataset; this pins the SEMANTICS on arbitrary ones (duplicate
  * timestamps across sides, empty keys, out-of-range points).
  */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  test("asofJoin equals brute force on random keyed series") {
    val rng = new scala.util.Random(19)
    val probe = Seq.tabulate(600) { i =>
      (i.toLong, rng.nextInt(8).toLong, new Timestamp(rng.nextInt(100000).toLong * 1000))
    }.toDF("probe_id", "k", "ts")
    // unique on (k, ts) by construction: value derived from the slot
    val buildRows = (for {
      k <- 0L until 6L // keys 6,7 never get builds -> null payload
      slot <- 0 until 40 if rng.nextBoolean()
    } yield (k, new Timestamp(slot * 2500L * 1000), k * 1000.0 + slot)).toSeq
    val build = buildRows.toDF("k", "ts", "payload")
    val got = Temporal.asofJoin(probe, build, Seq("k"), "ts", "payload")
      .select($"probe_id", $"payload")
      .as[(Long, Option[Double])].collect().toMap
    val byKey = buildRows.groupBy(_._1)
    probe.as[(Long, Long, Timestamp)].collect().foreach { case (pid, k, ts) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2.getTime <= ts.getTime)
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(got(pid) == want, s"probe $pid key $k ts $ts")
    }
  }

  test("rangeJoinBinned equals brute force incl. spans much wider than the bin") {
    val rng = new scala.util.Random(23)
    val points = Seq.tabulate(400) { i =>
      (i.toLong, rng.nextInt(4).toLong, rng.nextInt(10000).toLong)
    }.toDF("pt_id", "k", "pt")
    val intervals = Seq.tabulate(60) { i =>
      val lo = rng.nextInt(10000).toLong
      // spans 0..30x the 100-unit bin width
      (i.toLong, rng.nextInt(4).toLong, lo, lo + rng.nextInt(3000).toLong)
    }.toDF("iv_id", "k", "lo", "hi")
    val got = Temporal.rangeJoinBinned(intervals, points, Seq("k"), "pt", "lo", "hi",
        binWidth = 100L)
      .select($"iv_id", $"pt_id").as[(Long, Long)].collect().toSet
    val ptRows = points.as[(Long, Long, Long)].collect()
    val want = intervals.as[(Long, Long, Long, Long)].collect().flatMap {
      case (iv, k, lo, hi) =>
        ptRows.filter(p => p._2 == k && p._3 >= lo && p._3 <= hi).map(p => (iv, p._1))
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "degenerate test data: no interval hits")
  }
}
