package graft

import org.apache.spark.sql.DataFrame

/** The oracle SQL for a core subset of queries is engine-portable ANSI —
  * prove it by running the EXACT same SQL text through `spark.sql` over
  * temp views and comparing with the DataFrame-API results. One query
  * text, three engines (DataFrame plan, Spark SQL, DuckDB).
  */
class SqlParitySpec extends SparkSuite {

  /** Queries whose oracle text avoids DuckDB-only functions. */
  private val portable = Seq(
    "flagship_updates", "j2_new_instances", "p9_dimension_names",
    "s9_unique_violations", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q18_big_orders", "k1_salted_pricing_by_flag",
    "j4_exists_urgent_customers", "f3_customer_name_ops",
    "q17_small_qty_revenue", "q21_waiting_suppliers",
    "q8_market_share", "q16_supplier_counts", "q19_disjunctive_revenue",
    "q2_min_cost_supplier", "q13_order_count_distribution",
    "q22_dormant_balances", "q15_top_revenue_supplier",
    "q20_bulk_part_suppliers",
    "q4_order_priority_count", "q6_forecast_revenue", "q7_volume_shipping",
    "q9_product_type_profit", "q11_important_parts", "q12_priority_shipping",
    "g8_region_rollup")

  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
      .map(_.toSeq)
      .sortBy(_.mkString(""))
      .toSeq
  }

  test("oracle SQL text runs identically through spark.sql") {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
      }
    portable.foreach { name =>
      val viaSql = canon(spark.sql(SparkEntry.oracleSql(name)))
      val viaDf = canon(SparkEntry.queries(name)(spark, sf0001))
      assert(viaSql === viaDf, s"SQL/DataFrame divergence in $name")
    }
  }
}
