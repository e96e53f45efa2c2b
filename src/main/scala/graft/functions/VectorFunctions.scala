package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Static helpers the generated code calls. Accumulation is double-precision
  * in index order — the exact summation the DuckDB oracle reproduces with
  * `unnest(range(...))`, so results are bit-identical across engines.
  */
object FloatVecUtil {
  /** Fixed-point element scale (2^20) — the rank-key discipline's single
    * source of truth, shared with the operator layer and every oracle.
    */
  val FxScaleLong: Long = 1L << 20
  private val FxScaleD: Double = FxScaleLong.toDouble

  /** floor(v·2^20 + 0.5) — identical to the SQL twins' per-element cast. */
  def fx(v: Float): Long = math.floor(v.toDouble * FxScaleD + 0.5).toLong

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def norm2(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  private def fxNormSq(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val x = fx(a.getFloat(i)); acc += x * x; i += 1 }
    acc
  }

  /** Fixed-point cosine: exact integer dot/norm² (order-free), then the
    * identical scalar chain every engine evaluates bit-equally; 0 when
    * either norm is 0. One fused primitive loop — no fx array ever
    * materializes.
    */
  def fxCosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // dot over a shared prefix with norms over full lengths would be a
    // silently deflated metric; mismatched dims are a caller bug — fail loud
    require(n == b.numElements(),
      s"fxCosine: dimension mismatch ($n vs ${b.numElements()})")
    val na2 = fxNormSq(a)
    val nb2 = fxNormSq(b)
    if (na2 == 0L || nb2 == 0L) 0.0
    else {
      var d = 0L
      var i = 0
      while (i < n) { d += fx(a.getFloat(i)) * fx(b.getFloat(i)); i += 1 }
      d.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble))
    }
  }

  /** PQ asymmetric-distance sum: `dt` is the query's M×Ks distance table
    * (array of arrays), `codes` the candidate's M subspace codes — the
    * result is Σ_m dt[m][codes[m]]. M table lookups, no float math, no
    * allocation; the hot inner loop of every PQ candidate scan.
    */
  def adcSum(dt: ArrayData, codes: ArrayData): Long = {
    val m = codes.numElements()
    // a code addressing a missing table row/entry is always a caller bug
    // (codebook/corpus mismatch) — fail loud, never a truncated distance.
    // UnsafeArrayData reads are NOT bounds-checked (Java asserts are off by
    // default), so an out-of-range code would read adjacent memory and
    // return a plausible-but-wrong distance; check every code explicitly.
    require(dt.numElements() == m,
      s"adcSum: subspace mismatch (${dt.numElements()} vs $m)")
    var s = 0L
    var i = 0
    while (i < m) {
      val row = dt.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"adcSum: code $c out of [0, ${row.numElements()}) in subspace $i")
      s += row.getLong(c)
      i += 1
    }
    s
  }

  /** Fixed-point squared L2 distance to a pre-quantized constant vector. */
  def fxL2To(a: ArrayData, cFx: Array[Long]): Long = {
    val n = a.numElements()
    // same fail-loud contract as fxCosine: a prefix-truncated distance is
    // a wrong-but-plausible metric (wrong nearest-centroid assignment),
    // and a dimension mismatch is always a caller bug (corrupt row, wrong
    // codebook for the corpus)
    require(n == cFx.length,
      s"fxL2To: dimension mismatch ($n vs ${cFx.length})")
    var acc = 0L
    var i = 0
    while (i < n) { val t = fx(a.getFloat(i)) - cFx(i); acc += t * t; i += 1 }
    acc
  }

  /** [[fxL2To]] over an ALREADY-fixed-point long array — the residual-PQ
    * encode kernel ([[graft.operators.PqAnn]] v27): residuals live in the
    * fx domain (fx(v) − centroid_fx, exact integers), so no inline
    * quantization happens here.
    */
  def l2LongTo(a: ArrayData, cFx: Array[Long]): Long = {
    val n = a.numElements()
    require(n == cFx.length,
      s"l2LongTo: dimension mismatch ($n vs ${cFx.length})")
    var acc = 0L
    var i = 0
    while (i < n) { val t = a.getLong(i) - cFx(i); acc += t * t; i += 1 }
    acc
  }
}

/** Dot product of two `array<float>` columns as a native Catalyst expression
  * with whole-stage codegen — a tight primitive loop instead of the
  * `zip_with` + `aggregate` lambda chain (which allocates a joined array per
  * row). This is the hot path of the brute-force ANN scan: at 100 TB the
  * scan is O(rows × dim) multiply-adds and must not allocate.
  */
case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    FloatVecUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FloatVecUtil.dot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ ADC lookup-sum of a distance-table column against a codes column
  * (see [[FloatVecUtil.adcSum]]) — a codegen'd M-lookup loop replacing
  * the `zip_with` + `aggregate` lambda chain, which allocated a zipped
  * array and dispatched two lambdas per candidate row.
  */
case class AdcSumF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(dt: Any, codes: Any): Any =
    FloatVecUtil.adcSum(dt.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FloatVecUtil.adcSum($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of an `array<float>` column (codegen'd, double accumulator). */
case class L2NormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    FloatVecUtil.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.FloatVecUtil.norm2($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fixed-point cosine of two `array<float>` columns — the codegen'd rank
  * key of the vector stack: elements quantize inline to 2^20 longs, dot
  * and norm² accumulate as exact integers (order-free in any engine), and
  * only the final scalar chain is float. One tight loop, no fx arrays —
  * measured ~2-3× faster per row than the `transform`+`zip_with`+
  * `aggregate` higher-order-function formulation it replaces.
  */
case class FxCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    FloatVecUtil.fxCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FloatVecUtil.fxCosine($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fixed-point squared L2 distance from an `array<float>` column to a
  * pre-quantized constant vector (a centroid / codebook entry baked into
  * the generated code as a long[] reference).
  */
case class FxL2To(child: Expression, cFx: IndexedSeq[Long]) extends UnaryExpression {
  // the constant is held as an IndexedSeq so case-class equality/hashCode
  // (and thus Catalyst canonicalization + subexpression elimination) compare
  // it structurally — an Array field compares by reference and two
  // structurally-equal FxL2To instances would never be deduplicated
  private lazy val cArr: Array[Long] = cFx.toArray
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    FloatVecUtil.fxL2To(a.asInstanceOf[ArrayData], cArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cfx", cArr, "long[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.FloatVecUtil.fxL2To($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Squared L2 from a fixed-point `array<bigint>` column to a quantized
  * constant — [[FxL2To]]'s sibling for inputs already in the fx domain
  * (the v27 residual arrays). Same IndexedSeq-for-canonicalization note.
  */
case class L2LongTo(child: Expression, cFx: IndexedSeq[Long]) extends UnaryExpression {
  private lazy val cArr: Array[Long] = cFx.toArray
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    FloatVecUtil.l2LongTo(a.asInstanceOf[ArrayData], cArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cfx", cArr, "long[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.FloatVecUtil.l2LongTo($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))
  def l2normF(a: Column): Column =
    Bridge.column(L2NormF(Bridge.expression(a)))
  /** cosine(a, b) with double accumulation; 0 when either norm is 0. */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{when, lit}
    val d = dotF(a, b)
    val n = l2normF(a) * l2normF(b)
    when(n === lit(0.0), lit(0.0)).otherwise(d / n)
  }
  /** Fixed-point cosine (the rank-key kernel — see [[FxCosine]]). */
  def cosFxF(a: Column, b: Column): Column =
    Bridge.column(FxCosine(Bridge.expression(a), Bridge.expression(b)))
  /** Fixed-point squared L2 to a quantized constant (see [[FxL2To]]). */
  def fxL2ToF(a: Column, cFx: Array[Long]): Column =
    Bridge.column(FxL2To(Bridge.expression(a), cFx.toIndexedSeq))
  /** Long-domain squared L2 to a constant (see [[L2LongTo]]). */
  def l2LongToF(a: Column, cFx: Array[Long]): Column =
    Bridge.column(L2LongTo(Bridge.expression(a), cFx.toIndexedSeq))
  /** PQ ADC lookup-sum (see [[AdcSumF]]). */
  def adcSumF(dt: Column, codes: Column): Column =
    Bridge.column(AdcSumF(Bridge.expression(dt), Bridge.expression(codes)))
}
