package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (ST-depth beyond the reference, which only consumes
  * one topic): the streaming twin of the batch range join
  * [[graft.operators.TemporalJoins]] (j6).
  *
  * Both sides carry watermarks and the join condition bounds event time in
  * BOTH directions, which is what lets Spark expire buffered state: a
  * purchase can be dropped from state once the error-side watermark passes
  * `p_ts + window`, and an error once the purchase-side watermark passes
  * its `e_ts`. Without the time bounds the state store grows forever — the
  * difference between a stream job that runs for months and one that OOMs.
  */
object StreamJoins {

  /** Errors attributed to a purchase by the same user within `window`
    * AFTER the purchase (inclusive bounds, mirroring the batch j6
    * semantics). Inputs are streaming DataFrames with columns
    * (p_user, p_id, p_ts) and (e_user, e_id, e_ts).
    */
  def purchaseErrorJoin(
      purchases: DataFrame,
      errors: DataFrame,
      window: String = "10 minutes",
      lateness: String = "1 minute"): DataFrame = {
    val p = purchases.withWatermark("p_ts", lateness)
    val e = errors.withWatermark("e_ts", lateness)
    p.join(
      e,
      expr(
        s"""p_user = e_user AND
           |e_ts >= p_ts AND
           |e_ts <= p_ts + interval $window""".stripMargin))
      .select(col("p_user").as("user_id"), col("p_id"), col("e_id"), col("p_ts"), col("e_ts"))
  }
}
