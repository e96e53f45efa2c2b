package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a typed `Aggregator` (the user-facing UDAF surface):
  * buffer = one running minimum per permutation, merge = element-wise min —
  * associative + commutative, so Spark computes it with map-side partial
  * aggregation and a tiny shuffle (numPerms longs per doc), the sketch-
  * aggregation shape that scales to 100 TB.
  *
  * Permutation p of shingle s is the same chained xxhash64 the
  * column-expression formulation in
  * [[graft.operators.Dedup.minhashSignatures]] computes
  * (`xxhash64(lit(p), col("s"))` = bytes-hash seeded by the long-hash of
  * p), so the two paths agree BIT-FOR-BIT — asserted in AvroMinHashSpec.
  * The expression path stays in codegen; this path is the extensible-UDAF
  * demonstration.
  */
class MinHashAgg(numPerms: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val u = UTF8String.fromString(shingle)
    var p = 0
    while (p < numPerms) {
      // xxhash64(p, s) exactly as the SQL expression chains it: the int
      // hash of p (seed 42) seeds the byte hash of s
      val h = XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes(), XXH64.hashInt(p, 42L))
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
