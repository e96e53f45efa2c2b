package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static helpers the generated code calls. Accumulation is double-precision
  * in index order — the exact summation the DuckDB oracle reproduces with
  * `unnest(range(...))`, so results are bit-identical across engines.
  */
object FloatVecUtil {
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

/** L2 norm of an `array<float>` column (codegen'd, double accumulator). */
case class L2NormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    FloatVecUtil.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.FloatVecUtil.norm2($a)")
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
}
