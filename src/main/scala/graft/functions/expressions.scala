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
