package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — MOSS,
  * SIGMOD 2003, public): polynomial rolling hash over every k-gram of the
  * UTF-8 bytes, then the minimum hash of each window of w consecutive
  * k-grams (rightmost min, deduplicated by position). Guarantees any
  * shared substring of length ≥ w+k-1 contributes a shared fingerprint —
  * the classic local-similarity sketch for plagiarism/near-dup detection.
  *
  * One linear pass per document (rolling update, no re-hash per k-gram),
  * kept as a static helper so whole-stage codegen calls it directly.
  */
object WinnowingUtil {
  final val Base = 1000003L

  def fingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val numGrams = n - k + 1
    val hashes = new Array[Long](numGrams)
    // basePow = Base^(k-1) for the rolling remove-leading-byte step
    var basePow = 1L
    var i = 0
    while (i < k - 1) { basePow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = h
    i = 1
    while (i < numGrams) {
      h = (h - (bytes(i - 1) & 0xFF) * basePow) * Base + (bytes(i + k - 1) & 0xFF)
      hashes(i) = h
      i += 1
    }
    if (numGrams <= w) {
      var m = hashes(0)
      i = 1
      while (i < numGrams) { if (hashes(i) <= m) m = hashes(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = new ArrayBuffer[Long]()
    var lastPos = -1
    var win = 0
    while (win <= numGrams - w) {
      // rightmost minimum of hashes[win, win+w)
      var mPos = win
      i = win + 1
      while (i < win + w) { if (hashes(i) <= hashes(mPos)) mPos = i; i += 1 }
      if (mPos != lastPos) { out += hashes(mPos); lastPos = mPos }
      win += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow(text) -> array<long>` fingerprint expression. */
case class WinnowingFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    WinnowingUtil.fingerprint(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowingUtil.fingerprint($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Winnowing {
  // k=16 bytes spans ~3 words of typical text — sub-word k-grams collide
  // across unrelated documents and blow up the inverted index; any shared
  // substring of length ≥ w+k-1 = 23 still contributes a shared entry.
  def winnow(text: Column, k: Int = 16, w: Int = 8): Column =
    Bridge.column(WinnowingFingerprint(Bridge.expression(text), k, w))
}
