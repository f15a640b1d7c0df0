package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style compactor ladder (Karnin, Lang & Liberty, FOCS'16): level
  * `i` holds items of weight 2^i; an over-capacity level is sorted and
  * every other item promoted one level up. Capacities decay
  * geometrically from the top (`k`, then ⌈k·(2/3)^d⌉, floor 2), so
  * total state is O(k) regardless of n. The compaction coin is the
  * per-level compaction parity — deterministic, so the same input in
  * the same partition order yields the same sketch (randomized coins
  * only tighten constants; determinism is what the oracle discipline
  * needs). While n ≤ k nothing compacts and the sketch is EXACT — the
  * degenerate twin that t30's DuckDB oracle checks; the sketchy regime
  * is spec-bounded instead (rank error ≤ ~3/k·n observed ≪ theory).
  */
final class KllBuffer(val k: Int) {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
  val parities: mutable.ArrayBuffer[Boolean] = mutable.ArrayBuffer(false)
  var n: Long = 0L

  private def capacity(level: Int): Int = {
    val depth = levels.length
    val c = k * math.pow(2.0 / 3.0, (depth - 1 - level).toDouble)
    math.max(2, math.ceil(c).toInt)
  }

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1
    compress()
  }

  /** Compact bottom-up until every level fits. One pass suffices per
    * insert; after a merge the while-loop drains the excess.
    */
  def compress(): Unit = {
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > capacity(i)) {
        val sorted = levels(i).sorted
        val keepOdd = parities(i)
        parities(i) = !parities(i)
        if (i + 1 == levels.length) {
          levels += mutable.ArrayBuffer.empty[Double]
          parities += false
        }
        val start = if (keepOdd) 1 else 0
        var j = start
        while (j < sorted.length) {
          levels(i + 1) += sorted(j)
          j += 2
        }
        // the unselected half is discarded; survivors carry weight 2^(i+1)
        levels(i).clear()
        // odd-length buffers under an odd coin keep ⌈len/2⌉; the weight
        // accounting stays exact because n tracks true inserts, and rank
        // queries use the ladder weights, not n, for cumulation
      }
      i += 1
    }
  }

  def merge(other: KllBuffer): Unit = {
    while (levels.length < other.levels.length) {
      levels += mutable.ArrayBuffer.empty[Double]
      parities += false
    }
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    n += other.n
    compress()
  }

  /** Weighted items, sorted by value. */
  def weighted(): Array[(Double, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortBy(_._1).toArray
  }

  /** Smallest value whose cumulative ladder weight reaches
    * max(1, ⌈p·W⌉), W = total ladder weight (= n while exact).
    */
  def quantiles(probs: Seq[Double]): Array[Double] = {
    val items = weighted()
    if (items.isEmpty) return probs.map(_ => Double.NaN).toArray
    val totalW = items.map(_._2).sum
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * totalW).toLong)
      var cum = 0L
      var idx = 0
      var res = items.last._1
      var done = false
      while (idx < items.length && !done) {
        cum += items(idx)._2
        if (cum >= target) { res = items(idx)._1; done = true }
        idx += 1
      }
      res
    }.toArray
  }
}

object KllBuffer {
  def serialize(buffer: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.n)
    out.writeInt(buffer.levels.length)
    var i = 0
    while (i < buffer.levels.length) {
      out.writeBoolean(buffer.parities(i))
      out.writeInt(buffer.levels(i).length)
      buffer.levels(i).foreach(out.writeDouble)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.n = in.readLong()
    val depth = in.readInt()
    buf.levels.clear()
    buf.parities.clear()
    var i = 0
    while (i < depth) {
      buf.parities += in.readBoolean()
      val len = in.readInt()
      val lvl = new mutable.ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { lvl += in.readDouble(); j += 1 }
      buf.levels += lvl
      i += 1
    }
    buf
  }
}

/** `kll_quantiles(expr, k, probs)` — mergeable quantile sketch as a
  * native aggregate (TypedImperativeAggregate): O(k) state per
  * partial, partials combine associatively, so per-shard sketches
  * UNION into corpus quantiles without a second scan — the
  * distributed complement to t29's HLL distinct sketch and the
  * scale-out replacement for a full sort at 100 TB. Returns
  * `array<double>` aligned with `probs`. Exact while n ≤ k (the
  * oracle-checked twin); approximate beyond with O(1/k) rank error.
  *
  * Reference computes percentiles with pandas `quantile` at
  * single-node scale (e.g. `validators/semantic.py` outlier rules);
  * this is the mergeable form.
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, k, probs) - KLL-style mergeable quantile sketch.")
case class KllQuantiles(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

  require(k >= 8, "kll_quantiles needs k >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "kll_quantiles probs must be in [0, 1]")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllBuffer, input: KllBuffer): KllBuffer = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllBuffer): Any =
    new GenericArrayData(buffer.quantiles(probs))

  override def serialize(buffer: KllBuffer): Array[Byte] =
    KllBuffer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_quantiles"
}

/** `kll_sketch_agg(expr, k)` — the STATE-valued sibling of
  * [[KllQuantiles]] (DataSketches-style API, mirroring Spark's
  * `hll_sketch_agg`): returns the serialized sketch itself, so
  * per-shard / per-day sketches can be PERSISTED and re-merged later
  * with [[KllMergeAgg]] without touching the data again — the shape
  * [[graft.streaming.Streaming.quantileSink]] maintains live. Unlike
  * HLL union, KLL merge is NOT idempotent (weights add), so replay
  * safety must come from batch-id fencing, not from the merge algebra
  * — the sink documents and tests exactly that.
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, k) - serialized KLL quantile sketch of expr.")
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

  require(k >= 8, "kll_sketch_agg needs k >= 8")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllBuffer, input: KllBuffer): KllBuffer = {
    buffer.merge(input); buffer
  }
  override def eval(buffer: KllBuffer): Any = KllBuffer.serialize(buffer)
  override def serialize(buffer: KllBuffer): Array[Byte] = KllBuffer.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): KllBuffer = KllBuffer.deserialize(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_merge_agg(sketch)` — merges serialized KLL sketches (the
  * `hll_union_agg` analogue). The buffer adopts the first input's `k`;
  * mixed-k merges keep the smaller k's guarantees.
  */
@ExpressionDescription(
  usage = "_FUNC_(sketch) - merge serialized KLL sketches.")
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // k=8 placeholder: an empty buffer merged with the first real input
  // adopts the input's content; k stays the min of the participants'
  // effective capacities (conservative)
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(8)
  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v == null) return buffer
    val in = KllBuffer.deserialize(v.asInstanceOf[Array[Byte]])
    if (buffer.n == 0L && buffer.levels.forall(_.isEmpty)) in
    else { buffer.merge(in); buffer }
  }
  override def merge(buffer: KllBuffer, input: KllBuffer): KllBuffer =
    if (buffer.n == 0L && buffer.levels.forall(_.isEmpty)) input
    else { buffer.merge(input); buffer }
  override def eval(buffer: KllBuffer): Any = KllBuffer.serialize(buffer)
  override def serialize(buffer: KllBuffer): Array[Byte] = KllBuffer.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): KllBuffer = KllBuffer.deserialize(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_merge_agg"
}

/** `kll_sketch_quantiles(sketch, probs)` — reads quantiles out of a
  * serialized sketch. Runs at metadata scale (one row per key of a
  * sketch table), so interpreted eval is the right cost point —
  * deliberately not codegen'd.
  */
case class KllSketchQuantiles(child: Expression, probs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
  with ExpectsInputTypes {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "kll_sketch_quantiles probs must be in [0, 1]")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      KllBuffer.deserialize(input.asInstanceOf[Array[Byte]]).quantiles(probs))
  override protected def withNewChildInternal(newChild: Expression): KllSketchQuantiles =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch_quantiles"
}
