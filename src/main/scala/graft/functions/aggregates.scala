package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries summary state: at most `k` counters. */
final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  /** Classic MG update: increment if tracked, insert if room, else
    * decrement every counter (dropping zeros) — each element's final
    * counter underestimates its true count by at most n/(k+1).
    */
  def add(item: UTF8String, weight: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None if counts.size < k => counts.update(item, weight)
      case None =>
        // decrement-all by the insertion weight, bounded by the
        // smallest counter so one pass suffices for weight > 1
        val dec = math.min(weight, counts.valuesIterator.min)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.mapValuesInPlace((_, c) => c - dec)
        counts.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(counts.remove)
        if (weight > dec) add(item, weight - dec)
    }
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): add
    * counters pairwise, then if more than k survive, subtract the
    * (k+1)-th largest value from all and drop the non-positive —
    * the error bounds of the two inputs add, nothing worse.
    */
  def merge(other: MgBuffer): Unit = {
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counts.remove)
    }
  }
}

/** `mg_topk(expr, k)` — Misra-Gries heavy-hitter CANDIDATES as a native
  * mergeable aggregate (TypedImperativeAggregate): bounded state (≤ k
  * counters per partial), partials combine associatively, so it runs
  * as a map-side-combinable aggregate exactly like sum — the
  * distributed-sketch shape that replaces a full groupBy-count at
  * 100 TB. Returns `array<struct<item, est_count>>` sorted by count
  * desc then item; every item with true frequency > n/(k+1) is
  * guaranteed present, and `est_count` underestimates the true count
  * by at most n/(k+1) (never overestimates). Deterministic given the
  * partitioning; candidates are recounted exactly downstream (t13),
  * which removes even that sensitivity.
  *
  * Reference counts frequencies with exact pandas value_counts at
  * single-node scale; this is the scale-out form (Misra & Gries 1982;
  * Agarwal et al. 2012 for the merge).
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, k) - Misra-Gries top-k heavy-hitter candidates.")
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with ExpectsInputTypes {

  require(k >= 1, "mg_topk needs k >= 1")

  // string input only: misuse fails analysis as a type-check error, not
  // at execution as a raw ClassCastException in update()
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].copy())
    buffer
  }

  override def merge(buffer: MgBuffer, input: MgBuffer): MgBuffer = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val sorted = buffer.counts.toArray
      .sortBy { case (item, c) => (-c, item.toString) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    })
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_topk"
}

/** Bounded top-k state: a min-heap of (ord, tie, payload) that keeps
  * the k LARGEST ords (ties to the SMALLEST tie id). The heap root is
  * the current worst element, so insertion past capacity is one
  * compare + one replace — O(log k), state O(k) forever.
  */
final class TopKBuffer(val k: Int) {
  // priority = "worst first": ascending ord, then DESCENDING tie (the
  // larger tie loses the tie-break, so it sits closer to eviction)
  private val ord = Ordering.by[(Double, Long, Any), (Double, Long)] {
    case (o, t, _) => (-o, t)
  }
  val heap: mutable.PriorityQueue[(Double, Long, Any)] =
    mutable.PriorityQueue.empty(ord)

  def add(o: Double, t: Long, payload: Any): Unit = {
    if (heap.size < k) heap.enqueue((o, t, payload))
    else {
      val (wo, wt, _) = heap.head
      if (o > wo || (o == wo && t < wt)) { heap.dequeue(); heap.enqueue((o, t, payload)) }
    }
  }

  def merge(other: TopKBuffer): Unit =
    other.heap.foreach { case (o, t, p) => add(o, t, p) }

  /** Descending ord, ascending tie — the presentation order. */
  def sorted: Array[(Double, Long, Any)] =
    heap.toArray.sortBy { case (o, t, _) => (-o, t) }
}

/** `topk_by(ord, tie, payload, k)` — EXACT per-group top-k as a native
  * aggregate (the bounded-heap form of ROW_NUMBER-rank-filter): each
  * partial keeps at most k rows, partials map-side combine, so the
  * shuffle carries ≤ k·partitions rows per group instead of the
  * group's whole population — the 100 TB replacement for a rank
  * window, which must shuffle AND sort every row of every group.
  * Returns `array<struct<ord, tie, payload>>` sorted descending by
  * ord, ties to the lowest tie id (deterministic for any
  * partitioning). The reference takes per-group heads off sorted
  * pandas frames (`nlargest`/`sort_values().head()`); this is the
  * scale-out form.
  */
@ExpressionDescription(
  usage = "_FUNC_(ord, tie, payload, k) - exact top-k rows per group by ord desc.")
case class TopKByOrd(
    ordExpr: Expression,
    tieExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  require(k >= 1, "topk_by needs k >= 1")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(DoubleType, LongType, org.apache.spark.sql.graftshim.GraftTypes.AnyType)
  override def children: Seq[Expression] = Seq(ordExpr, tieExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false),
    StructField("payload", payloadExpr.dataType, payloadExpr.nullable))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val t = tieExpr.eval(input)
    if (o != null && t != null) {
      // payload values may be backed by reused UnsafeRow memory —
      // copy before they outlive the input row
      val p = InternalRow.copyValue(payloadExpr.eval(input))
      buffer.add(o.asInstanceOf[Double], t.asInstanceOf[Long], p)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (o, t, p) => InternalRow(o, t, p) })

  @transient private lazy val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Array[DataType](payloadExpr.dataType))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach { case (o, t, p) =>
      out.writeDouble(o)
      out.writeLong(t)
      val row = proj(InternalRow(p))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val o = in.readDouble()
      val t = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      row.pointTo(b, len)
      buf.add(o, t, InternalRow.copyValue(row.get(0, payloadExpr.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByOrd =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByOrd =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByOrd =
    copy(ordExpr = newChildren(0), tieExpr = newChildren(1),
      payloadExpr = newChildren(2))
  override def prettyName: String = "topk_by"
}
