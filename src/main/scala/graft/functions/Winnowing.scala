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
  * code points, then the minimum hash of each window of w consecutive
  * k-grams (rightmost min, deduplicated by position). Guarantees any
  * shared substring of length ≥ w+k-1 contributes a shared fingerprint —
  * the classic local-similarity sketch for plagiarism/near-dup detection.
  *
  * One linear pass per document (rolling update, no re-hash per k-gram),
  * kept as a static helper so whole-stage codegen calls it directly.
  *
  * The hash is the Karp-Rabin polynomial mod P = 2^31 - 1 over CODE
  * POINTS (not bytes): every intermediate stays below 2^52, so an
  * external SQL oracle replays it exactly with per-position polynomial
  * evaluation — same portability contract as
  * [[PortableHash]]. Character indexing (substr/ord) is what other
  * engines expose, hence code points rather than UTF-8 bytes.
  */
object WinnowingUtil {
  final val Base = 1000003L
  final val P: Long = (1L << 31) - 1

  def fingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val numGrams = n - k + 1
    val hashes = new Array[Long](numGrams)
    // basePow = Base^(k-1) mod P for the rolling remove-leading step
    var basePow = 1L
    var i = 0
    while (i < k - 1) { basePow = basePow * Base % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + cps(i)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < numGrams) {
      // cp*basePow < 2^21 · 2^31 and (h + P)·Base < 2^52 — exact in a long
      h = ((h + P - cps(i - 1) * basePow % P) % P * Base + cps(i + k - 1)) % P
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
  // k=16 chars spans ~3 words of typical text — sub-word k-grams collide
  // across unrelated documents and blow up the inverted index; any shared
  // substring of length ≥ w+k-1 = 23 still contributes a shared entry.
  val K = 16
  val W = 8

  def winnow(text: Column, k: Int = K, w: Int = W): Column =
    Bridge.column(WinnowingFingerprint(Bridge.expression(text), k, w))

  /** Base^t mod P — for oracle-SQL generation. */
  def powMod(t: Int): Long = {
    var r = 1L
    var i = 0
    while (i < t) { r = r * WinnowingUtil.Base % WinnowingUtil.P; i += 1 }
    r
  }
}
