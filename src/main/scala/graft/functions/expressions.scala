package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the ag-domain scalar functions
  * (SURVEY §2.7 F1-F8) and the text/vector sketches (dedup & similarity).
  * All are null-intolerant, deterministic, and whole-stage-codegen
  * friendly: generated code calls the static helpers in
  * [[graft.functions.TextOps]] etc. directly.
  */

/** Deflate compression ratio of a string (Gopher-family repetition/
  * boilerplate quality signal). Codegen'd call into the static helper;
  * deterministic for a given zlib level.
  */
case class GzipRatio(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TextOps.deflateRatio(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): GzipRatio = copy(c)
  override def prettyName: String = "gzip_ratio"
}

/** Binary media-header dims: `"png:640x480"` / gif / bmp, null for
  * anything unrecognized or truncated — see
  * [[graft.functions.MediaOps.mediaDims]]. Runs inside whole-stage
  * codegen over raw `binary` payloads, so metadata extraction from a
  * 100 TB media corpus is one projection, no decode library.
  */
case class MediaDims(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MediaOps.mediaDims(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaOps.mediaDims($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
    code
  }
  override protected def withNewChildInternal(c: Expression): MediaDims = copy(c)
  override def prettyName: String = "media_dims"
}

/** F3 — accent stripping (reference `normalize/crops.py:6-8`). */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextOps.stripAccents(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(c)
  override def prettyName: String = "strip_accents"
}

/** Unicode NFC composition (dedup preprocessing — composed and
  * decomposed spellings must fingerprint identically).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextOps.nfcNormalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  override def prettyName: String = "nfc_normalize"
}

/** Canonical whitespace/lowercase normalization (dedup preprocessing). */
case class NormalizeWs(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextOps.normalizeWs(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.normalizeWs($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeWs = copy(c)
  override def prettyName: String = "normalize_ws"
}

/** F6 — Portuguese title-case (initcap keeps "de/da/do" lowercase). */
case class TitleCasePt(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextOps.titleCasePt(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.titleCasePt($c)")
  override protected def withNewChildInternal(c: Expression): TitleCasePt = copy(c)
  override def prettyName: String = "title_case_pt"
}

/** F1 — BR decimal parse ("R$ 1.234,56" -> 1234.5600). Null on junk, so
  * the expression is nullable even for non-null input.
  */
case class ParseBrDecimal(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DecimalType(18, 4)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    BrOps.parseBrDecimal(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BrOps.parseBrDecimal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): ParseBrDecimal = copy(c)
  override def prettyName: String = "parse_br_decimal"
}

/** F8 — harvest year of a date ("2024/25"; Jul 1 boundary). */
case class SafraOf(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SafraOps.safraOf(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SafraOps.safraOf($c)")
  override protected def withNewChildInternal(c: Expression): SafraOf = copy(c)
  override def prettyName: String = "safra_of"
}

/** F8 — normalize safra spellings ("24/25" -> "2024/25"). */
case class NormalizeSafra(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SafraOps.normalizeSafra(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SafraOps.normalizeSafra($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): NormalizeSafra = copy(c)
  override def prettyName: String = "normalize_safra"
}

/** F7 — exact unit conversion via kg pivot, DECIMAL(18,4) HALF_UP. */
case class ConvertUnit(value: Expression, from: Expression, to: Expression, produto: Expression)
    extends QuaternaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DecimalType(18, 4)
  override def nullable: Boolean = true
  override def first: Expression = value
  override def second: Expression = from
  override def third: Expression = to
  override def fourth: Expression = produto
  override def nullSafeEval(v: Any, f: Any, t: Any, p: Any): Any =
    UnitOps.convertUnit(
      v.asInstanceOf[org.apache.spark.sql.types.Decimal],
      f.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, f, t, p) => s"""
      ${ev.value} = graft.functions.UnitOps.convertUnit($v, $f, $t, $p);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): ConvertUnit =
    copy(a, b, c, d)
  override def prettyName: String = "convert_unit"
}

/** SimHash (Charikar 2002) of a document — 64-bit near-dup sketch. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchOps.simhash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** Stable 64-bit text hash (FNV-1a + splitmix64 finalizer). */
case class Hash64(child: Expression, seed: Long) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchOps.hash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.hash64($c, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Hash64 = copy(child = c)
  override def prettyName: String = "hash64"
}

/** MinHash signature (Broder 1997) over word shingles. */
case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchOps.minhash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      shingleSize, numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchOps.minhash($c, $shingleSize, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Winnowing fingerprint (Schleimer et al. 2003): canonical Array[Long]. */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchOps.winnow(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Winnow = copy(child = c)
  override def prettyName: String = "winnow"
}

/** Cosine similarity of two float vectors (index-ordered double accum).
  * Declares float-array inputs with implicit casting — an
  * `array<double>` argument is cast, not silently reinterpreted.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(l, r)
  override def prettyName: String = "cosine_sim"
}

/** Shared prepared form of a centroid set for the plan-reference cell
  * kernels: row-major primitive doubles plus per-centroid squared
  * norms, extracted ONCE per deserialized expression (i.e. once per
  * executor per stage — the expression rides in the stage's
  * task-binary TorrentBroadcast, so centroids ship exactly as
  * efficiently as a broadcast relation) instead of once per
  * (row, centroid) ArrayData unwrap. The accumulation order of every
  * double matches [[VecOps.cosine]] bit for bit, so these kernels are
  * drop-in replacements for the `aggregate`-fold forms they supersede
  * (differential specs hold all three forms equal).
  */
trait CentroidKernel {
  def cents: Seq[Seq[Float]]
  @transient protected lazy val dims: Int = if (cents.isEmpty) 0 else cents.head.length
  @transient protected lazy val flat: Array[Double] = {
    val a = new Array[Double](cents.length * dims)
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)
      var i = 0
      while (i < dims && i < cv.length) { a(j * dims + i) = cv(i).toDouble; i += 1 }
      j += 1
    }
    a
  }
  @transient protected lazy val norms2: Array[Double] = {
    val n = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      var s = 0.0; var i = 0
      while (i < dims) { val y = flat(j * dims + i); s += y * y; i += 1 }
      n(j) = s; j += 1
    }
    n
  }

  /** One primitive copy of the row vector (d values), so the C-centroid
    * scan runs over plain double[] instead of C×d virtual
    * `ArrayData.getFloat` calls. Values are bit-identical to the
    * unwrapped floats, so every downstream double matches the
    * unwrap-per-visit form exactly.
    */
  protected final def toLocal(v: org.apache.spark.sql.catalyst.util.ArrayData,
      d: Int): Array[Double] = {
    val a = new Array[Double](d)
    var i = 0
    while (i < d) { a(i) = v.getFloat(i).toDouble; i += 1 }
    a
  }

  /** cos(v, centroid j) with [[VecOps.cosine]]'s exact fp order. */
  protected final def cos(v: Array[Double], na: Double, j: Int): Double = {
    var dot = 0.0
    var i = 0
    val off = j * dims
    while (i < v.length) { dot += v(i) * flat(off + i); i += 1 }
    if (na == 0.0 || norms2(j) == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(norms2(j)))
  }

  protected final def norm2(v: Array[Double]): Double = {
    var na = 0.0; var i = 0
    while (i < v.length) { val x = v(i); na += x * x; i += 1 }
    na
  }
}

/** Argmax-cosine Voronoi cell id of a vector over a centroid set
  * carried as a PLAN REFERENCE (not a literal in the expression tree,
  * not a joined relation) — the hot kernel of IVF cell assignment.
  * One codegen'd call per row replaces a C-step Catalyst fold or an
  * N×C join; generated code stays constant-size at any C. Ties keep
  * the FIRST (lowest-cid) centroid and an empty centroid set yields
  * the -1 sentinel, matching [[graft.ops.VectorSearch.nearestCell]]
  * and the broadcast-row fold exactly.
  */
case class CellAssign(child: Expression, cents: Seq[Seq[Float]])
    extends UnaryExpression with ImplicitCastInputTypes with CentroidKernel {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType

  def assign(v: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val lv = toLocal(v, math.min(v.numElements(), dims))
    val na = norm2(lv)
    var best = -2.0
    var bestCid = -1
    var j = 0
    while (j < cents.length) {
      val s = cos(lv, na, j)
      if (s > best) { best = s; bestCid = j }
      j += 1
    }
    bestCid
  }

  override def nullSafeEval(v: Any): Any =
    assign(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellAssign", this, classOf[CellAssign].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }
  override protected def withNewChildInternal(c: Expression): CellAssign =
    copy(child = c)
  override def prettyName: String = "cell_assign"
}

/** Top-`nprobe` cells by cosine for a vector over a plan-reference
  * centroid set — the multi-probe sibling of [[CellAssign]] (IVF
  * probe-side fan-out). Ordering matches the fold form's
  * `reverse(array_sort(struct(sim, cid)))` exactly: sim descending,
  * then cid DESCENDING on exact fp ties. Returns min(nprobe, C) ids.
  */
case class CellProbes(child: Expression, cents: Seq[Seq[Float]], nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CentroidKernel {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def probes(v: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val lv = toLocal(v, math.min(v.numElements(), dims))
    val na = norm2(lv)
    val np = math.min(nprobe, cents.length)
    val topS = new Array[Double](np)
    val topC = new Array[Int](np)
    var filled = 0
    var j = 0
    while (j < cents.length) {
      val s = cos(lv, na, j)
      // insertion position: after every slot that beats (s, j) under
      // (sim desc, cid desc) — scanning cids ascending means an equal
      // sim must DISPLACE the earlier (smaller) cid to mirror the sort
      var k = filled
      while (k > 0 && (topS(k - 1) < s || (topS(k - 1) == s && topC(k - 1) < j))) k -= 1
      if (k < np) {
        val last = math.min(filled, np - 1)
        var m = last
        while (m > k) { topS(m) = topS(m - 1); topC(m) = topC(m - 1); m -= 1 }
        topS(k) = s; topC(k) = j
        if (filled < np) filled += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topC, filled))
  }

  override def nullSafeEval(v: Any): Any =
    probes(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellProbes", this, classOf[CellProbes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probes($c)")
  }
  override protected def withNewChildInternal(c: Expression): CellProbes =
    copy(child = c)
  override def prettyName: String = "cell_probes"
}

/** Product-quantization encoder over plan-reference codebooks: the
  * input `array<double>` vector splits into `m` subvectors and each
  * takes its L2-argmin cell id in subspace `s`'s codebook — one
  * codegen'd call per row, m·c·subLen doubles prepared once per
  * executor (layout [sub][cid][pos]). Matches the codebook-literal
  * fold and the broadcast-join `min_by` exactly: squared distance
  * accumulated in index order, strict improvement only (ties -> lowest
  * cid). Returns the m-element `array<int>` PQ code.
  */
case class PqEncodeCodes(child: Expression, books: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val m: Int = books.length
  @transient private lazy val c: Int = if (books.isEmpty) 0 else books.head.length
  @transient private lazy val subLen: Int =
    if (books.isEmpty || books.head.isEmpty) 0 else books.head.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * c * subLen)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < c) {
        val cv = books(s)(j)
        var i = 0
        while (i < subLen && i < cv.length) {
          a((s * c + j) * subLen + i) = cv(i).toDouble; i += 1
        }
        j += 1
      }
      s += 1
    }
    a
  }

  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = v.numElements()
    val lv = new Array[Double](n)
    var i = 0
    while (i < n) { lv(i) = v.getDouble(i); i += 1 }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.MaxValue
      var bestCid = -1
      var j = 0
      while (j < c) {
        var d = 0.0
        val boff = (s * c + j) * subLen
        val voff = s * subLen
        var k = 0
        while (k < subLen && voff + k < n) {
          val diff = lv(voff + k) - flat(boff + k)
          d += diff * diff; k += 1
        }
        if (d < best) { best = d; bestCid = j }
        j += 1
      }
      codes(s) = bestCid
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeCodes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeCodes =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** L2 normalization of an `array<double>` vector as ONE codegen'd call
  * ([[VecOps.l2normalize]]) — replaces the `sqrt(aggregate(...))` +
  * `filter(nrm > 0)` + `transform(x => x / nrm)` chain on the ANN hot
  * paths. Higher-order Catalyst expressions (ArrayAggregate /
  * ArrayTransform) evaluate their lambda bodies interpreted, outside
  * whole-stage codegen; this kernel is a plain-Java loop inside the
  * span. NULL marks the rows the old chain's filter dropped (zero/NaN
  * norm), so callers filter `isNotNull` — arithmetic is bit-identical
  * (index-ordered double accumulation, one division per element).
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.l2normalize(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VecOps.l2normalize($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): L2Normalize =
    copy(child = c)
  override def prettyName: String = "l2_normalize"
}

/** [[L2Normalize]] over an `array<float>` input whose reference chain
  * squared in FLOAT (Catalyst types `x * x` over float elements as a
  * float multiply before the double accumulate) — see
  * [[VecOps.l2normalizeF]]. Kept as a separate expression so each
  * call site states which accumulation it is bit-preserving.
  */
case class L2NormalizeF(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.l2normalizeF(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VecOps.l2normalizeF($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): L2NormalizeF =
    copy(child = c)
  override def prettyName: String = "l2_normalize_f"
}

/** Elementwise subtraction of a LITERAL vector from an `array<double>`
  * column — the codegen'd form of
  *   zip_with(v, typedlit(m), (x, mj) => x - mj)
  * (mean-centering on the PCA/training paths). Same per-element double
  * subtract; NULL on length mismatch, where zip_with's null padding
  * would poison the downstream fold.
  */
case class SubtractLit(child: Expression, lits: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val m: Array[Double] = lits.toArray

  def sub(v: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (v.numElements() != m.length) return null
    val out = new Array[Double](m.length)
    var i = 0
    while (i < m.length) { out(i) = v.getDouble(i) - m(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    sub(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subLit", this, classOf[SubtractLit].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.sub($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression): SubtractLit =
    copy(child = c)
  override def prettyName: String = "subtract_lit"
}

/** Seeded dot product of an `array<double>` vector against a LITERAL
  * weight vector — the codegen'd form of
  *   aggregate(zip_with(v, typedlit(w), (a, b) => a * b), lit(seed),
  *             (acc, p) => acc + p)
  * with the identical IEEE sequence: acc starts at `seed` and adds
  * v(i)·w(i) in index order. `zip_with` over unequal lengths pads with
  * NULL and the fold collapses to NULL — mirrored by returning NULL on
  * a length mismatch. Weights ride as ONE plan-reference object
  * (prepared once per executor, like [[CellAssign]]'s centroids), not a
  * per-row literal array walk, and the whole product stays inside the
  * whole-stage-codegen span where the HOF pair was a CodegenFallback
  * island.
  */
case class DotProductLit(child: Expression, weights: Seq[Double], seed: Double)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  @transient private lazy val w: Array[Double] = weights.toArray

  def lengthOk(v: org.apache.spark.sql.catalyst.util.ArrayData): Boolean =
    v.numElements() == w.length

  def dot(v: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    var acc = seed
    var i = 0
    while (i < w.length) { acc = acc + v.getDouble(i) * w(i); i += 1 }
    acc
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (lengthOk(a)) dot(a) else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotLit", this, classOf[DotProductLit].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($ref.lengthOk($c)) { ${ev.value} = $ref.dot($c); }
      else { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression): DotProductLit =
    copy(child = c)
  override def prettyName: String = "dot_product_lit"
}

/** `round(x, 6).cast(DECIMAL(28,6))` as its exact UNSCALED LONG
  * (10^6·round(x, 6)) — see [[VecOps.round6ScaledLong]] for the
  * bit-faithfulness argument. Lets the repo's exact-decimal trainer
  * aggregations (`sum` of 6-dp-rounded terms) run as primitive long
  * sums; pair with `try_sum` so overflow surfaces as NULL instead of
  * wrapping. NULL on NaN/±Inf, exactly where the decimal cast nulled.
  */
case class Round6ScaledLong(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (x.isNaN || x.isInfinite) null else VecOps.round6ScaledLong(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (Double.isNaN($c) || Double.isInfinite($c)) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.functions.VecOps.round6ScaledLong($c); }""")
  override protected def withNewChildInternal(c: Expression): Round6ScaledLong =
    copy(child = c)
  override def prettyName: String = "round6_scaled_long"
}

/** Random-hyperplane LSH bucket (nbits sign bits) for cosine ANN. */
case class HyperplaneLsh(child: Expression, nbits: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.GraftTypes.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneLsh(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nbits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.hyperplaneLsh($c, $nbits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
  override def prettyName: String = "hyperplane_lsh"
}
