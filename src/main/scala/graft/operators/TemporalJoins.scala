package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the events stream, composed from built-ins
  * per the preference ladder (no custom plan node needed):
  *
  *   - AS-OF join: each purchase matched to the user's most recent prior
  *     view. Implemented as the union + running-last-value window — one
  *     shuffle on user_id, no per-row probing; the standard distributed
  *     as-of formulation.
  *   - RANGE (band) join: error events within a fixed window after a
  *     purchase by the same user. A naive theta-join is a per-user cross
  *     product; instead both sides are bucketed by `sec div band` and
  *     joined on (user, bucket∈{b, b+1}) then filtered — the banded
  *     equi-join that keeps the join key equi and the candidate set
  *     linear at 100 TB.
  *
  * All arithmetic is integer epoch seconds → exactly reproducible in the
  * DuckDB oracle.
  */
object TemporalJoins {

  // ts normalization (µs TIMESTAMP_NTZ vs legacy int64 nanos) is
  // centralized in RelationalOps.eventsTable/secEvents
  private def secEvents(spark: SparkSession, dir: String): DataFrame =
    RelationalOps.secEvents(spark, dir)

  /** AS-OF: (purchase, latest prior view) per user; unmatched purchases
    * keep a null view id.
    */
  def asOfPurchaseView(spark: SparkSession, dir: String): DataFrame = {
    val ev = secEvents(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1) // strictly prior rows
    ev
      .withColumn("prior_view_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("prior_view_sec",
        last(when(col("event_type") === "view", col("sec")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("prior_view_id"),
        (col("sec") - col("prior_view_sec")).as("gap_sec"))
  }

  // events are sparse per user (~hours apart); a day-scale window keeps
  // the operator non-degenerate at every sf
  private val BandSec = 86400L

  /** RANGE: errors within (0, 1 day] after a purchase, same user. */
  def purchaseErrorWithin(spark: SparkSession, dir: String): DataFrame = {
    val ev = secEvents(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("sec").as("psec"))
      // a purchase can match errors in its own bucket or the next one
      .withColumn("bucket", explode(array(
        expr(s"psec div $BandSec"), expr(s"psec div $BandSec") + 1)))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("sec").as("esec"))
      .withColumn("bucket", expr(s"esec div $BandSec"))
    purchases.join(errors, Seq("user_id", "bucket"))
      .filter(col("esec") > col("psec") && col("esec") - col("psec") <= BandSec)
      .select(
        col("user_id"), col("purchase_id"), col("error_id"),
        (col("esec") - col("psec")).as("gap_sec"))
      .distinct() // a pair can collide in both probed buckets
  }
}
