package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator` (the user-facing UDAF surface):
  * buffer = one running minimum per permutation, merge = element-wise min —
  * associative + commutative, so Spark computes it with map-side partial
  * aggregation and a tiny shuffle (numPerms longs per doc), the sketch-
  * aggregation shape that scales to 100 TB.
  *
  * Permutation p of shingle s is the same [[PortableHash]] affine map the
  * column-expression formulation in
  * [[graft.operators.Dedup.minhashSignatures]] computes (one md5 per
  * shingle, `(a_p·x + b_p) mod P` per permutation), so the two paths agree
  * BIT-FOR-BIT — asserted in AvroMinHashSpec — and both replay exactly in
  * the DuckDB oracle. The expression path stays in codegen; this path is
  * the extensible-UDAF demonstration.
  */
class MinHashAgg(numPerms: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val x = PortableHash.md5Prefix60(
      shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % PortableHash.P
    var p = 0
    while (p < numPerms) {
      val h = PortableHash.perm(p, x)
      if (h < buf(p)) buf(p) = h
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerms) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity from two signatures: fraction of agreeing
    * permutation minima.
    */
  def estimate(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length
  }
}
