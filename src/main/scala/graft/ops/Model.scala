package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-scale model TRAINING as distributed aggregation — the missing
  * top rung of the quality-classifier ladder (a22 scores a linear head,
  * a26 evaluates AUC, a27 calibrates; this is where the weights come
  * FROM, reference `quality.py`'s scoring heuristics re-expressed as a
  * learned filter). Both trainers follow the same 100 TB-safe shape as
  * the IVF k-means trainer ([[VectorSearch.trainCentroids]]): each
  * epoch/iteration is ONE full aggregation pass whose state is O(dim)
  * — map-side combinable sums, never a per-row shuffle — and the only
  * driver-side materialization is the model itself (≤ dim+1 doubles).
  *
  * Numeric discipline (the repo-wide oracle contract): every per-row
  * contribution is rounded to 6 dp and summed as DECIMAL(28,6), so the
  * aggregate is EXACT and independent of partitioning/accumulation
  * order; the driver-side update arithmetic (divide, scale, subtract,
  * HALF_UP round to 6 dp) mirrors term-for-term what a SQL engine
  * computes over the same sums, which is what lets a28/a29 be
  * DuckDB-hash-checked despite being iterative algorithms.
  */
object Model {

  /** Exact 6-dp sum term as an unscaled long
    * ([[graft.functions.Round6ScaledLong]] — bit-faithful to
    * `round(x,6).cast(DECIMAL(28,6))` including the intermediate
    * double), wrapped in `try_sum` so a sum past the long range
    * surfaces as NULL instead of wrapping silently. The long path cut
    * the trainer passes' per-row cost ~2-3x vs Decimal aggregation
    * (the arithmetic and every result bit are unchanged; see
    * Round6SumSpec for the equivalence pin and the overflow pin).
    */
  private def sum6(x: Column): Column =
    try_sum(graft.functions.GraftFunctions.round6Long(x))

  /** Driver-side decode of a [[sum6]] field: NULL past `require` means
    * the exact sum overflowed ~9.2e12 (2^63/10^6) — at that magnitude a
    * silently wrapped gradient would corrupt the model deterministically
    * (hash checks can't catch it), so fail loudly with the fix spelled
    * out. `BigDecimal.valueOf(u, 6).doubleValue` is the same double the
    * old DECIMAL(28,6) sum's `.doubleValue` produced.
    */
  private def dec6Field(row: org.apache.spark.sql.Row, name: String,
      who: String): Double = {
    val i = row.fieldIndex(name)
    require(!row.isNullAt(i),
      s"$who: exact 6-dp sum '$name' exceeded the long range (~9.2e12); " +
        "train on a bounded sample (sampleMod) or shrink the batch")
    java.math.BigDecimal.valueOf(row.getLong(i), 6).doubleValue
  }

  /** HALF_UP 6-dp round — the driver-side twin of Spark/DuckDB
    * `round(x, 6)` (both round half away from zero for doubles).
    */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One logistic-regression epoch state: weights (index-aligned with
    * the embedding) and bias, both 6-dp-rounded.
    */
  final case class LogRegModel(weights: Seq[Double], bias: Double)

  /** Full-batch gradient-descent logistic regression over a vector
    * column, `epochs` passes at learning rate `lr`. Per epoch: one
    * aggregation computes the dim+1 gradient sums
    * Σ round((σ(z_i) − y_i)·x_ij, 6) (exact decimal), z_i the seeded
    * left-fold dot product (a22's codegen shape) rounded to 6 dp; the
    * driver applies w ← round(w − lr·S/n, 6). Returns every epoch's
    * model so callers can expose the training TRAJECTORY (loss curves,
    * oracle checks on intermediate weights).
    *
    * Scale: the per-epoch plan is scan → project → one partial+final
    * agg of dim+1 decimal sums — no shuffle wider than the aggregate's
    * single combine row. Epochs are sequential by nature; at 100 TB the
    * dominant cost is E corpus scans, the textbook full-batch tradeoff
    * (cache the projected features between epochs where memory allows,
    * exactly as callers of trainCentroids do).
    */
  def trainLogReg(df: DataFrame, vecCol: String, labelCol: Column,
      dims: Int, epochs: Int, lr: Double = 1.0): Seq[LogRegModel] = {
    // no fanOut: measured a small net loss here (solo a28 1.81 -> 2.09 s)
    // — the per-epoch gradient pass is too light at this dim count to
    // amortize the exchange; the sums are order-exact either way
    val base = df.select(col(vecCol).as("v"), labelCol.cast("double").as("y"))
    var w: Seq[Double] = Seq.fill(dims)(0.0)
    var b: Double = 0.0
    val out = Seq.newBuilder[LogRegModel]
    for (_ <- 1 to epochs) {
      // codegen'd bias-seeded dot ([[graft.functions.DotProductLit]]):
      // identical IEEE fold order to the zip_with/aggregate pair (the
      // float elements were widened per product there, by the cast here)
      val z = round(graft.functions.GraftFunctions.dotLit(
        col("v").cast("array<double>"), w, b), 6)
      val err = round(lit(1.0) / (lit(1.0) + exp(-z)), 6) - col("y")
      val sums = base
        .select((0 until dims).map(j =>
          sum6(err * col("v")(j)).as(s"g$j")) :+
          sum6(err).as("gb") :+
          count(lit(1)).as("n"): _*)
        .head()
      require(sums.getAs[Long]("n") > 0L,
        "trainLogReg: empty training set (zero rows after projection)")
      val n = sums.getAs[Long]("n").toDouble
      w = (0 until dims).map(j =>
        r6(w(j) - lr * dec6Field(sums, s"g$j", "trainLogReg") / n))
      b = r6(b - lr * dec6Field(sums, "gb", "trainLogReg") / n)
      out += LogRegModel(w, b)
    }
    out.result()
  }

  /** Per-row prediction column for a trained model: σ(w·x + b) with the
    * same fold/rounding as training, so scoring a corpus with the
    * returned model is a pure zero-shuffle projection (a22's plan).
    */
  def predict(vec: Column, m: LogRegModel): Column =
    round(lit(1.0) / (lit(1.0) + exp(-round(graft.functions.GraftFunctions
      .dotLit(vec.cast("array<double>"), m.weights, m.bias), 6))), 6)

  /** Mean-centered top principal component by distributed power
    * iteration (the O(dim) PCA that actually runs at 100 TB — no
    * dim×dim covariance materialization, no per-row shuffle):
    *   pass 0: mean_j = round(Σ round(x_j,6) / n, 6)        (one agg)
    *   pass t: u_j = round(Σ round(c_j·(c·v_t), 6) / n, 6)  (one agg)
    *           v_{t+1,j} = round(u_j / ‖u‖, 6)
    * with c = x − mean and v_0 = e_1. Each pass's state is dim decimal
    * sums; ‖u‖ is a driver-side fold over the dim sums in index order.
    * Deterministic start + exact sums make every iterate reproducible
    * bit-for-bit by any engine that mirrors the arithmetic (a29's
    * oracle does, in SQL). Returns (mean, every iterate v_1..v_T).
    */
  def powerIterationPc1(df: DataFrame, vecCol: String, dims: Int,
      iters: Int): (Seq[Double], Seq[Seq[Double]]) = {
    // fanOut: same stance as trainLogReg — per-pass gram products off a
    // one-task scan otherwise; decimal sums keep iterates exact
    val base = fanOut(df.select(col(vecCol).as("v")))
    val mRow = base
      .select((0 until dims).map(j =>
        sum6(col("v")(j)).as(s"m$j")) :+
        count(lit(1)).as("n"): _*)
      .head()
    require(mRow.getAs[Long]("n") > 0L,
      "powerIterationPc1: empty input (zero vectors)")
    val n = mRow.getAs[Long]("n").toDouble
    val mean = (0 until dims).map(j =>
      r6(dec6Field(mRow, s"m$j", "powerIterationPc1") / n))
    var v: Seq[Double] = 1.0 +: Seq.fill(dims - 1)(0.0)
    val iterates = Seq.newBuilder[Seq[Double]]
    for (_ <- 1 to iters) {
      // codegen'd mean-centering + dot kernels (SubtractLit /
      // DotProductLit): per-element double subtract and index-ordered
      // fold, bit-identical to the zip_with/aggregate pair they replace
      val centered = graft.functions.GraftFunctions.subLit(
        col("v").cast("array<double>"), mean)
      val dot = graft.functions.GraftFunctions.dotLit(centered, v)
      val uRow = base
        .select(centered.as("c"), dot.as("d"))
        .select((0 until dims).map(j =>
          sum6(col("c")(j) * col("d")).as(s"u$j")): _*)
        .head()
      val u = (0 until dims).map(j =>
        r6(dec6Field(uRow, s"u$j", "powerIterationPc1") / n))
      val norm = math.sqrt(u.foldLeft(0.0)((acc, x) => acc + x * x))
      require(norm > 0.0, "powerIterationPc1: zero-variance input " +
        "(all vectors equal after centering) has no principal direction")
      v = u.map(x => r6(x / norm))
      iterates += v
    }
    (mean, iterates.result())
  }
}
