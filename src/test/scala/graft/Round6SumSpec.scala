package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.GraftFunctions

/** Pins the exact-long fast path the trainer aggregations switched to
  * (round 14): `try_sum(round6_scaled_long(x))` must be BIT-faithful to
  * the `sum(round(x, 6).cast(DECIMAL(28,6)))` chain it replaced
  * (including the chain's intermediate double and its NaN/Inf-to-NULL
  * cast), and — the part the Decimal path never had to prove — a sum
  * past the long range must surface as NULL (try_sum) rather than wrap
  * silently into a plausible-looking corrupt gradient.
  */
class Round6SumSpec extends SparkSuite {
  import spark.implicits._

  private val dec6 = DecimalType(28, 6)

  test("round6_scaled_long ≡ round(x,6).cast(decimal) on adversarial values") {
    // Ties at the 7th decimal, shortest-repr traps (doubles whose binary
    // value sits just below the printed decimal), negatives (HALF_UP is
    // half AWAY FROM ZERO for both Spark round and BigDecimal), zero
    // crossings, large magnitudes where round-to-6dp is no longer exact
    // in double, and subnormals.
    val xs = Seq(
      0.1234565, -0.1234565, 0.12345649999999999, -0.12345650000000001,
      0.0000005, -0.0000005, 0.0000004999999999, 1.5e-7, -1.5e-7,
      0.1, -0.1, 1.0 / 3.0, -1.0 / 3.0, math.Pi, -math.E,
      123456.1234565, -123456.1234565, 9.87654321e8, -9.87654321e8,
      1.000000049999, 2.5000005, -2.5000005, 0.0, -0.0,
      4.9e-324, -4.9e-324, 1e-18, 7.0710678118654755e-1)
    val df = xs.toDF("x")
    val rows = df.select(
      GraftFunctions.round6Long(col("x")).as("fast"),
      round(col("x"), 6).cast(dec6).as("ref")).collect()
    rows.zip(xs).foreach { case (r, x) =>
      val ref = r.getAs[java.math.BigDecimal]("ref")
      val fast = java.math.BigDecimal.valueOf(r.getAs[Long]("fast"), 6)
      assert(ref.compareTo(fast) == 0, s"mismatch at x=$x: ref=$ref fast=$fast")
    }
  }

  test("NaN and ±Inf map to NULL exactly like the decimal cast") {
    val df = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.25).toDF("x")
    val rows = df.select(
      GraftFunctions.round6Long(col("x")).as("fast"),
      round(col("x"), 6).cast(dec6).as("ref")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null behavior diverged: fast=${r.get(0)} ref=${r.get(1)}")
    }
    // and sum skips the nulls identically
    val s = df.select(
      try_sum(GraftFunctions.round6Long(col("x"))).as("fast"),
      sum(round(col("x"), 6).cast(dec6)).as("ref")).head()
    assert(java.math.BigDecimal.valueOf(s.getAs[Long]("fast"), 6)
      .compareTo(s.getAs[java.math.BigDecimal]("ref")) == 0)
  }

  test("random fuzz: 20k doubles sum identically under both paths") {
    val rnd = new scala.util.Random(4242)
    val xs = Seq.fill(20000)((rnd.nextDouble() - 0.5) *
      math.pow(10, rnd.nextInt(8) - 4))
    val s = xs.toDF("x").repartition(7).select(
      try_sum(GraftFunctions.round6Long(col("x"))).as("fast"),
      sum(round(col("x"), 6).cast(dec6)).as("ref")).head()
    assert(java.math.BigDecimal.valueOf(s.getAs[Long]("fast"), 6)
      .compareTo(s.getAs[java.math.BigDecimal]("ref")) == 0)
  }

  test("trainCentroids refuses a wrapped fixed-point group instead of " +
      "silently corrupting the centroids") {
    // One cell, 10k rows of |x| = 1000: per-row units 1e15, group sum
    // 1e19 > 2^63 ≈ 9.2e18 — past the wrap point the old sum(long)
    // returned a plausible-looking negative total and the trained
    // centroid was deterministically wrong; now try_sum nulls and the
    // mean decode must throw.
    val rows = (0 until 10000).map(i => (i.toLong, Seq(1000.0f, 1000.0f)))
    val df = rows.toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.VectorSearch.trainCentroids(df, "id", "v", c = 1, iters = 1)
    }
    assert(e.getMessage.contains("overflowed"))
    // and comfortably inside the range the same shape still trains
    val ok = (0 until 1000).map(i => (i.toLong, Seq(i / 1000.0f, 1.0f)))
    val cents = graft.ops.VectorSearch.trainCentroids(
      ok.toDF("id", "v"), "id", "v", c = 1, iters = 1)
    assert(cents.length == 1 && cents.head.forall(f => !f.isNaN))
  }

  test("a sum past the long range is NULL (loud), never a wrapped value") {
    // 4 terms of ~4.6e12 each: pairwise sums fit, the total exceeds
    // 2^63/1e6 ≈ 9.22e12 — the silent-wrap scenario the old Decimal
    // path was immune to and the long path must refuse.
    val big = 4.6e12
    val df = Seq(big, big, -1.0, big, big).toDF("x").repartition(2)
    val s = df.select(try_sum(GraftFunctions.round6Long(col("x"))).as("s")).head()
    assert(s.isNullAt(0), s"overflowed sum did not surface as NULL: ${s.get(0)}")
  }
}
