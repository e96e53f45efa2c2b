package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation: keeps the k best (score, id, payload)
  * triples, ordered by score desc then id asc; the payload rides along
  * unused by the ordering (carry a differently-scaled output column — or
  * repeat the score when no payload is needed).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(...))
  * <= k`) must SORT every key's full partition before discarding all but k
  * rows. This aggregator keeps only k entries per group in the buffer and
  * merges buffers pairwise — map-side partial aggregation ships k rows per
  * key per partition instead of everything, the difference between a
  * full-sort shuffle and a tiny one at 100 TB.
  *
  * Buffer is a sorted Seq (k is small); merge is a bounded sorted merge —
  * associative and commutative, so partial aggregation is safe.
  *
  * (For the same shape as a whole-plan operator over untyped rows — no
  * Dataset encoding — see [[graft.plans.TopKPerKey]].)
  */
class TopKPayloadAgg(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]] {

  private def better(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long, Long)], in: (Long, Long, Long)): Seq[(Long, Long, Long)] =
    if (buf.size == k && !better(in, buf.last)) buf
    else ((buf :+ in).sortWith(better)).take(k)

  override def merge(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
}
