package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Fixtures.table

/** General relational operator coverage on the TPC-H-ish tables: scan +
  * filter + aggregate, multi-way joins, windows, set ops, rollup, JSON
  * extraction. The reference needs none of these directly (SURVEY.md §2.7)
  * but a complete engine does; each query is oracle-checked against DuckDB.
  *
  * Floating aggregates are rounded on both engines — double summation order
  * is nondeterministic under parallel aggregation, so unrounded sums are
  * not hash-comparable.
  */
object RelationalOps {

  private def tsNtz(s: String) = lit(s).cast("timestamp_ntz")

  /** The events table is written with nanosecond timestamps, which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read `ts` as raw
    * nanos (legacy nanosAsLong) and convert with integer division — a
    * double division would lose precision above 2^53 ns.
    */
  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** TPC-H Q1-style pricing summary: full scan + hash aggregate. At scale
    * this is a map-side partial agg into a 4-group reduce — no meaningful
    * shuffle. Filter is pushed to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= tsNtz("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: selective filters on both join sides, then join +
    * aggregate. customer is the small side → broadcast; lineitem↔orders
    * shuffles on the join key only after both filters prune.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = tsNtz("1995-03-15 00:00:00")
    val c = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = table(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val l = table(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("l_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderpriority"),
        col("revenue"))
  }

  /** TPC-H Q5-style local-supplier volume: 6-way join with two tiny
    * broadcast dims (nation, region) and the customer-nation = supplier-
    * nation co-location predicate.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(table(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(table(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(table(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** TPC-H Q18-style: aggregate subquery feeding a semi-join filter. */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    table(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total_price"),
        round(col("total_qty"), 2).as("total_qty"))
  }

  /** Window top-k: top 3 users per event type by activity; integer counts
    * with explicit tie-break make the ranking deterministic across engines.
    */
  def topUsersPerEventType(spark: SparkSession, dir: String): DataFrame = {
    val counts = eventsTable(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("n").desc, col("user_id"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("user_id"), col("n"), col("rn").cast("int").as("rn"))
  }

  /** Analytic windows: running total + lag delta per user ordered by
    * event_id. Deterministic frame order makes float results reproducible.
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    eventsTable(spark, dir)
      .filter(col("user_id") < 50)
      .select(
        col("user_id"), col("event_id"),
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("running_total"),
        round(col("value") - lag(col("value"), 1, 0.0).over(w), 2).as("delta"),
        row_number().over(w).cast("int").as("rn"))
  }

  /** Date-bucketed rollup with distinct aggregation. */
  def dailyEventRollup(spark: SparkSession, dir: String): DataFrame =
    eventsTable(spark, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).cast("date").as("day"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))

  /** ROLLUP grouping-sets aggregation (super-aggregate row labeled ALL). */
  def eventTypeRollup(spark: SparkSession, dir: String): DataFrame =
    eventsTable(spark, dir)
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type_g"), col("n"), col("total_value"))

  /** Set operation: users who purchased but never errored (EXCEPT). */
  def purchasersMinusErrored(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsTable(spark, dir)
    ev.filter(col("event_type") === "purchase").select(col("user_id"))
      .except(ev.filter(col("event_type") === "error").select(col("user_id")))
  }

  /** Set operation: users who both signed up and purchased (INTERSECT). */
  def signupAndPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsTable(spark, dir)
    ev.filter(col("event_type") === "signup").select(col("user_id"))
      .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
  }

  /** JSON extraction from the string props column. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    eventsTable(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") > 80)

  /** Correlated-EXISTS shape: customers holding at least one URGENT order —
    * planned as a left-semi join, no row duplication.
    */
  def customersWithUrgentOrders(spark: SparkSession, dir: String): DataFrame = {
    val urgent = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    table(spark, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** PIVOT: per-day event counts spread across event-type columns. */
  def eventPivotByDay(spark: SparkSession, dir: String): DataFrame =
    eventsTable(spark, dir)
      .select(date_trunc("DAY", col("ts")).cast("date").as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** Date arithmetic: shipping latency stats per order priority. */
  def shipLatency(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")).as("lat"))
      .groupBy(col("o_orderpriority"))
      .agg(
        min(col("lat")).as("min_days"),
        max(col("lat")).as("max_days"),
        round(avg(col("lat")), 2).as("avg_days"),
        count(lit(1)).as("n"))

  /** String-function battery over customer names (scalar fn coverage). */
  def customerNameOps(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        length(col("c_name")).cast("bigint").as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded_key"),
        concat_ws("|", col("c_mktsegment"), trim(col("c_name"))).as("tagged"))

  /** Exact interpolated median (percentile) of value per event type. */
  def medianValueByType(spark: SparkSession, dir: String): DataFrame =
    eventsTable(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 2).as("median_value"),
        round(expr("percentile(value, 0.9)"), 2).as("p90_value"))
}
