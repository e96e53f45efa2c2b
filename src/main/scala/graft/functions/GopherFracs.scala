package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The full Gopher repetition signal family (Rae et al. 2021, Table A1)
  * computed per document in ONE pass — every signal is a pure
  * within-document function, so the right 100 TB shape is map-only: no
  * reason to explode 9× the token count into a corpus-wide shuffle just to
  * group the grams back by (doc, n, gram). A doc's grams are counted in a
  * local hash map here instead; the operator built on this has ZERO
  * exchanges before its output.
  *
  * Layout of the returned array<long> (all e6 fractions of document
  * characters): [top2, top3, top4, dup5, dup6, dup7, dup8, dup9, dup10] —
  * for n=2..4 the characters covered by the most frequent word n-gram, for
  * n=5..10 the characters covered by n-grams occurring more than once
  * (capped at 1e6: overlapping occurrences double-count, as published).
  * Arithmetic is exact integer division, bit-identical to the exploded
  * two-aggregation formulation and to the DuckDB oracle
  * ([[graft.operators.TextAnalysis.gopherRepetitionOracleSql]]); parity is
  * pinned by a spec comparing against the exploded reference.
  *
  * Kept as a static helper so whole-stage codegen calls it directly
  * (same discipline as [[SimHashUtil]]).
  */
object GopherUtil {
  final val MaxN = 10

  /** Token split on a single literal space, KEEPING empty tokens —
    * Spark's `split(text, " ")` semantics (limit -1) — as UTF-16 offset
    * pairs into `s`, so gram strings are substrings of `s` (joining
    * tokens with ' ' reproduces the original text exactly).
    */
  private def tokenBounds(s: String): (Array[Int], Array[Int]) = {
    var ntok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') ntok += 1; i += 1 }
    val starts = new Array[Int](ntok)
    val ends = new Array[Int](ntok)
    var t = 0
    var start = 0
    i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    (starts, ends)
  }

  /** The shared per-doc gram-count state: flat `[n, top_chars, dup_chars]`
    * triples for every n in 2..min(10, tokens) — empty below 2 tokens.
    * Both the fraction family ([[fracs]]) and the staged diagnostic
    * ([[stageTriples]]) derive from this one pass, so the t39 production
    * path and its t39s stage twin cannot drift apart.
    */
  private def stage(s: String): Array[Long] = {
    val (starts, ends) = tokenBounds(s)
    val ntok = starts.length
    if (ntok < 2) return Array.emptyLongArray
    val maxN = math.min(MaxN, ntok)
    val out = new Array[Long]((maxN - 1) * 3)
    var n = 2
    while (n <= maxN) {
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      val limit = ntok - n
      while (i <= limit) {
        val g = s.substring(starts(i), ends(i + n - 1))
        counts.put(g, counts.getOrDefault(g, 0) + 1)
        i += 1
      }
      var top = 0L
      var dup = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.toLong
        val g = e.getKey
        val chars = c * g.codePointCount(0, g.length)
        if (chars > top) top = chars
        if (c >= 2) dup += chars
      }
      val base = (n - 2) * 3
      out(base) = n.toLong
      out(base + 1) = top
      out(base + 2) = dup
      n += 1
    }
    out
  }

  /** The t39s stage surface: `[n, top_chars, dup_chars]` triples, flat. */
  def stageTriples(text: UTF8String): ArrayData =
    ArrayData.toArrayData(stage(text.toString))

  def fracs(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new Array[Long](9)
    val t = stage(s)
    if (t.nonEmpty) {
      // code points, matching Spark length() and DuckDB len()
      val nChars = s.codePointCount(0, s.length).toLong
      var j = 0
      while (j < t.length) {
        val n = t(j).toInt
        if (n <= 4) out(n - 2) = t(j + 1) * 1000000L / nChars
        else out(n - 2) = math.min(1000000L, t(j + 2) * 1000000L / nChars)
        j += 3
      }
    }
    ArrayData.toArrayData(out)
  }
}

/** `gopher_fracs(string) -> array<long>` as a native Catalyst expression —
  * one pass per row, inside whole-stage codegen.
  */
case class GopherFracsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GopherUtil.fracs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GopherUtil.fracs($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `gopher_stage(string) -> array<long>` — the flat per-n
  * `[n, top_chars, dup_chars]` triples from the same single-pass state as
  * [[GopherFracsExpr]], for the t39s staged diagnostic.
  */
case class GopherStageExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GopherUtil.stageTriples(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GopherUtil.stageTriples($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GopherFracs {
  def gopherFracs(text: Column): Column =
    Bridge.column(GopherFracsExpr(Bridge.expression(text)))
  def gopherStage(text: Column): Column =
    Bridge.column(GopherStageExpr(Bridge.expression(text)))
}
