package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for — each implemented
  * as the composition that scales, not the naive inequality join (which
  * Spark would execute as a broadcast-nested-loop product):
  *
  *  - as-of join: union the two sides and carry the build payload
  *    forward with one `last(ignoreNulls)` window — O(n log n) within
  *    each key partition, one shuffle, no range-condition join at all
  *    (the standard points/intervals trick; DuckDB/kdb ship it as a
  *    native `ASOF JOIN`, which is exactly what the oracle uses);
  *  - range join: bin the point side to fixed buckets, explode each
  *    interval to the buckets it covers, equi-join on (key, bucket),
  *    then apply the exact range predicate — candidates are bucket-
  *    local, never a per-key product.
  */
object Temporal {

  /** For every `probe` row, the `payload` of the `build` row with the
    * largest `ts <= probe.ts` within the same `keys` group (null when
    * no such row — LEFT-asof semantics). `build` must be unique on
    * (keys, ts); pre-aggregate if it is not.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      ts: String, payload: String): DataFrame = {
    val probeCols = probe.columns
    // tag orders build rows BEFORE probe rows at equal ts => inclusive <=
    val tagged = probe
      .withColumn(payload, lit(null).cast(build.schema(payload).dataType))
      .withColumn("_is_probe", lit(1))
      .unionByName(
        build.select((keys :+ ts :+ payload).map(col): _*)
          .withColumn("_is_probe", lit(0)),
        allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col("_is_probe") === 1)
      .select((probeCols.filterNot(_ == payload) :+ payload).map(col): _*)
  }

  /** [[asofJoin]] with a STALENESS bound (pandas `merge_asof`'s
    * `tolerance`): a build row older than `toleranceMs` at the probe's
    * timestamp is no match — the quote-too-stale-to-price rule. Same
    * single union-window shuffle; the build timestamp rides the carried
    * struct and the tolerance is a post-filter on it.
    */
  def asofJoinTolerance(probe: DataFrame, build: DataFrame, keys: Seq[String],
      ts: String, payload: String, toleranceMs: Long): DataFrame = {
    val packed = build.select(
      (keys :+ ts).map(col) :+
        struct(col(ts).as("bts"), col(payload).as("pv")).as("_pk"): _*)
    // unix_millis only accepts the session-tz TIMESTAMP type; the cast
    // admits TIMESTAMP_NTZ columns too, and any tz offset it introduces
    // cancels in the subtraction (exact under graft's pinned-UTC sessions).
    def epochMs(c: org.apache.spark.sql.Column) =
      unix_millis(c.cast(org.apache.spark.sql.types.TimestampType))
    asofJoin(probe, packed, keys, ts, "_pk")
      .withColumn(payload,
        when(col("_pk").isNotNull &&
          epochMs(col(ts)) - epochMs(col("_pk.bts")) <= toleranceMs,
          col("_pk.pv")))
      .drop("_pk")
  }

  /** Inner range join: pairs (interval, point) with the same `keys` and
    * `lo <= pt <= hi`. `binWidth` must be in the unit of `pt`/`lo`/`hi`
    * (exact integers — epoch micros for timestamps); every interval is
    * exploded to ceil(span/binWidth)+1 buckets, so pick binWidth near
    * the typical span.
    */
  def rangeJoinBinned(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], pt: String, lo: String, hi: String,
      binWidth: Long): DataFrame = {
    val b = lit(binWidth)
    val pts = points.withColumn("_bucket", floor(col(pt) / b).cast("long"))
    val ivs = intervals.withColumn("_bucket",
      explode(sequence(floor(col(lo) / b).cast("long"), floor(col(hi) / b).cast("long"))))
    ivs.join(pts, keys :+ "_bucket")
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("_bucket")
  }
}
