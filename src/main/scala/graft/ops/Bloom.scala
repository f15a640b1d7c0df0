package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter join reduction (the runtime-filter pattern
  * Spark itself applies under `spark.sql.optimizer.runtimeFilter.*`,
  * here as an explicit, deterministic operator — reference analogue:
  * `agrobr` pre-filters fact slices by the key set of the dimension
  * page it just fetched; at 100 TB the key SET doesn't broadcast but
  * a bit table does).
  *
  * Shape: the bloom is BUILT DISTRIBUTED — each build row contributes
  * k bit positions, positions aggregate per 64-bit word with `bit_or`
  * (map-side combinable), and only the finished words ever reach the
  * driver (m/64 longs, size-guarded). The probe side then tests all k
  * bits with native codegen'd expressions (element_at + shiftleft on a
  * literal word array) BEFORE the shuffle join — false positives are
  * possible and fine, because the exact join still runs afterwards;
  * what the bloom buys is that ~(1-sel) of the probe rows never enter
  * the exchange. No UDFs, no collect of data rows.
  */
object Bloom {

  /** ~10 bits/row ≈ 1% false-positive rate at k = 5 hash functions. */
  private val BitsPerRow = 10L

  /** 2^24 bits = 2 MiB of words — the broadcast-literal budget. A build
    * side too big for this bound is too big for a driver-held filter;
    * at that size use Spark's own runtime filter (AQE) or a semi-join.
    */
  private val MaxBits = 1L << 24

  final case class Filter(words: Array[Long], mBits: Long, k: Int) {
    /** Membership test column: true ⇒ key MAY be in the build set,
      * false ⇒ key is DEFINITELY absent. Pure native expressions, so
      * the whole test inlines into the probe scan's codegen stage.
      */
    def mightContain(key: Column): Column = {
      // one shared Literal for the word table — k bit tests reference
      // the same converted array instead of converting it k times
      val bits = typedlit(words.toSeq)
      (0 until k).map { i =>
        val pos = pmod(xxhash64(key, lit(i)), lit(mBits))
        val word = element_at(bits, (pos / 64).cast("int") + 1)
        word.bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast("int"))) =!= 0
      }.reduce(_ && _)
    }

    /** JVM-side twin of [[mightContain]] for STRING keys — bit-for-bit
      * the same k probes (Catalyst xxhash64 chaining from seed 42 over
      * (key, i), then pmod), pinned equal by BloomSpec. Exists because
      * the Column form is only fast where codegen reaches it: embedded
      * in an interpreted higher-order-function lambda (testing each
      * element of an array column), the word-table literal measured
      * ~1.4 ms PER ELEMENT — the literal's value participates in
      * per-eval expression machinery — versus sub-µs here, so per-gram
      * row paths close over the filter and call this instead.
      */
    /** Fraction of set bits. The classic estimates follow: FP rate ≈
      * fill^k, and the distinct-key count that produced the fill is
      * n ≈ -(m/k)·ln(1-fill) — both used by the saturation-regeneration
      * path (a long-lived incrementally-maintained bloom cannot keep a
      * frozen geometry forever; see
      * [[graft.streaming.Streaming.curationSink]]).
      */
    def fillFraction: Double = {
      var ones = 0L
      var i = 0
      while (i < words.length) { ones += java.lang.Long.bitCount(words(i)); i += 1 }
      ones.toDouble / mBits
    }

    def fpEstimate: Double = math.pow(fillFraction, k)

    /** Inverted fill formula; clamped to ≥1 so a sizing loop always
      * terminates. A fully-saturated filter (fill = 1.0) has lost the
      * information to estimate n — callers size from their own count.
      */
    def estimatedKeys: Long =
      if (fillFraction >= 1.0) Long.MaxValue
      else math.max(1L, math.round(-(mBits.toDouble / k) * math.log1p(-fillFraction)))

    def mightContainString(key: String): Boolean = {
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      import org.apache.spark.sql.types.{IntegerType, StringType}
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(i, IntegerType,
          XxHash64Function.hash(u, StringType, 42L))
        val pos = java.lang.Math.floorMod(h, mBits)
        if ((words((pos / 64).toInt) & (1L << (pos % 64).toInt)) == 0L)
          return false
        i += 1
      }
      true
    }
  }

  /** Builds the bloom over the distinct values of `keyCol`. `nRows` is
    * the (approximate) build cardinality used to size the table — a
    * stats estimate is fine; undersizing only raises the FP rate,
    * never correctness.
    */
  def build(build: DataFrame, keyCol: String, nRows: Long, k: Int = 5): Filter = {
    val mBits = math.min(MaxBits,
      math.max(64L, java.lang.Long.highestOneBit(nRows * BitsPerRow) * 2))
    union(empty(mBits, k), build, keyCol)
  }

  /** An all-zero filter of fixed geometry — the starting point for an
    * INCREMENTALLY-maintained bloom whose key space grows over time
    * (size for the ceiling, not the current cardinality: the geometry
    * is frozen at creation because bit positions depend on mBits).
    */
  def empty(mBits: Long = MaxBits, k: Int = 5): Filter =
    Filter(new Array[Long]((mBits / 64).toInt), mBits, k)

  /** Predicted FP rate of a k-hash bloom of `mBits` holding `n` keys:
    * (1 - e^(-kn/m))^k. Used to size a REGENERATED geometry before
    * paying the rebuild scan.
    */
  def predictedFp(mBits: Long, k: Int, n: Long): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / mBits), k)

  /** Hard ceiling for REGENERATED geometries: 2^27 bits = 16 MiB of
    * word table. 8× [[MaxBits]] gives a long-lived incrementally-grown
    * filter real headroom (≈18M keys at 1% FP vs MaxBits' ≈2.3M), but
    * stays a sane per-batch closure payload and bounds [[union]]'s
    * driver collect to 2M longs. Past this, one filter is the wrong
    * tool — shard by key range so each shard keeps a broadcastable
    * table.
    */
  val RegenMaxBits: Long = 1L << 27

  /** Smallest power-of-two doubling of `fromBits` whose predicted FP
    * for `n` keys is ≤ `targetFp`, capped at [[RegenMaxBits]] — past
    * that a bit table stops being a broadcastable gate. Hitting the cap
    * with the target still unmet logs a loud warning (the caller should
    * shard the key space); the returned geometry is still the best
    * available and stays CORRECT (a hotter bloom only admits more
    * false-positive suspects to the exact join behind it).
    */
  def sizeFor(n: Long, targetFp: Double, fromBits: Long, k: Int = 5): Long = {
    var m = fromBits
    while (m < RegenMaxBits && predictedFp(m, k, n) > targetFp) m *= 2
    if (predictedFp(m, k, n) > targetFp)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"bloom regeneration capped at $RegenMaxBits bits but $n keys " +
          f"predict FP ${predictedFp(m, k, n)}%.3f > target $targetFp%.3f; " +
          "shard the key space across multiple filters")
    m
  }

  /** `f` plus the keys of `build` — the incremental maintenance step.
    * Bit-setting is monotone and idempotent (bit_or), so unions are
    * order-free and replay-safe: re-adding an already-absorbed batch
    * is a no-op, which is what lets an always-on sink maintain its
    * bloom without batch-id bookkeeping. One distributed aggregate;
    * ≤ m/64 rows reach the driver — bounded by MaxBits/64 = 256 Ki
    * longs regardless of build size.
    */
  def union(f: Filter, build: DataFrame, keyCol: String): Filter = {
    val hashCols = (0 until f.k).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(f.mBits)))
    val words = f.words.clone()
    build.select(explode(array(hashCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int")).as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("word"))
      .collect()
      .foreach(r => words(r.getInt(0)) |= r.getLong(1))
    Filter(words, f.mBits, f.k)
  }

  /** Bloom-pruned inner equi-join: probe rows failing the membership
    * test are dropped at the scan; survivors (true hits + ≈1% FPs) go
    * through the ordinary exact join, so the result is identical to
    * `probe.join(buildDf, keys)` with a fraction of the shuffle.
    */
  def prunedJoin(probe: DataFrame, buildDf: DataFrame, probeKey: String,
      buildKey: String, nBuildRows: Long): DataFrame = {
    val f = build(buildDf, buildKey, nBuildRows)
    probe.filter(f.mightContain(col(probeKey)))
      .join(buildDf, probe(probeKey) === buildDf(buildKey))
  }
}
