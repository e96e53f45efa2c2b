package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index for two 8-bit bucket ids (a 256×256 grid) — the
  * locality-better alternative to the Morton/Z code in
  * [[graft.operators.DataLayout]]: consecutive Hilbert indices are
  * always GRID-ADJACENT cells (one step in exactly one axis), where the
  * Z curve jumps across the plane at power-of-two seams. Files covering
  * a Hilbert interval therefore cover a more compact region, which
  * tightens parquet min/max bounds on both clustered columns.
  *
  * Algorithm: the classic iterative xy→d walk (Hilbert 1891; iterative
  * form as in Warren, Hacker's Delight — public), 8 rotate-and-fold
  * steps for order 8.
  */
object HilbertUtil {
  final val Side = 256 // order-8 curve: 256×256 cells, d in [0, 65536)

  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & (Side - 1)
    var y = yIn & (Side - 1)
    var d = 0L
    var s = Side / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve is oriented canonically
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }
}

/** `hilbert16(x, y) -> long` as a native codegen expression (the
  * rotation state per step makes this awkward as built-in column ops,
  * unlike the Morton spread-shift sequence).
  */
case class Hilbert16(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.xy2d(a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertUtil.xy2d((long)($a), (long)($b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Hilbert {
  def hilbert16(x: Column, y: Column): Column =
    Bridge.column(Hilbert16(Bridge.expression(x), Bridge.expression(y)))
}
