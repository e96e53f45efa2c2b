package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash computation over a token array. Kept as a static helper so the
  * generated (whole-stage codegen) code can call it directly.
  *
  * Algorithm (Charikar 2002, public): hash every token, sum per-bit votes
  * (+1/-1), emit the sign bit-vector. Near-duplicate docs land within a
  * small Hamming distance.
  *
  * The per-token hash is [[PortableHash.md5Prefix60]] — 60 signature bits
  * instead of xxhash64's 64, in exchange for the whole signature (and the
  * pair pipeline built on it) replaying exactly in an external SQL oracle.
  */
object SimHashUtil {
  /** Signature width: the 60 bits an md5 hex prefix yields portably. */
  final val Bits = 60

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = PortableHash.md5Prefix60(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `simhash64(array<string>) -> long` as a native Catalyst expression.
  * A lambda-functions formulation would need 60 `transform` passes (one per
  * bit); this is one pass per row and stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashUtil.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHashUtil.compute($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash {
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
