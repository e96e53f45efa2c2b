package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
  * public) as a typed Aggregator: the buffer is the k smallest DISTINCT
  * hash values seen; merge is a bounded distinct sorted merge —
  * associative + commutative, so map-side partial aggregation ships at
  * most k longs per group per partition.
  *
  * Estimator (computed by the caller from the finished buffer): with
  * fewer than k values the buffer IS the distinct hash set (exact
  * count); otherwise distinct ≈ (k-1)·M / h_(k) for hash range M.
  * Built on [[PortableHash]] (range M = P), the whole sketch — buffer
  * contents and estimate — replays in an external SQL oracle via
  * per-group ORDER BY/row_number, making this the portable counterpart
  * of `approx_count_distinct`'s opaque HLL registers (a6).
  */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.length == k && x >= buf.last) buf // common case: not a new min
    else if (buf.contains(x)) buf // distinct-aware: re-seen values are free
    else ((buf :+ x).sorted).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvAgg {
  /** Default sketch size: ±1/√62 ≈ 13% relative error. */
  val DefaultK = 64
}
