package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures.table

/** MERGE INTO semantics as a composable operator — the snapshot-refresh
  * primitive every warehouse pipeline needs (Delta/Iceberg expose it as
  * SQL MERGE; plain Spark has no built-in): apply a change batch to a
  * target snapshot with the three classic branches,
  *
  *  - WHEN MATCHED THEN UPDATE (source row replaces the target row),
  *  - WHEN MATCHED AND is_delete THEN DELETE,
  *  - WHEN NOT MATCHED THEN INSERT,
  *
  * producing the next snapshot. Scale shape: ONE full-outer sort-merge
  * join on the key — each side shuffles once, and when both snapshots
  * are bucketed on the key ([[DataLayout.writeBucketed]]) even that
  * shuffle disappears, making the nightly refresh of a 100 TB dimension
  * a map-side merge. No driver-side state, no collect.
  */
object MergeOps {

  /** SCD-1 upsert of `source` into `target` on `keys`. Both frames must
    * share the target's column set; `deleteCol` (boolean, source-side)
    * marks MATCHED-DELETE rows. Source keys must be unique (standard
    * MERGE precondition — Delta throws on multiple matches too).
    */
  def upsert(
      target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    // qualified-name aliases, not DataFrame-reference columns: the source
    // batch routinely DERIVES from the target snapshot (self-join), where
    // df("col") disambiguation fails
    val t = target.alias("_t")
    val s = deleteCol
      .map(c => source.withColumnRenamed(c, "_del"))
      .getOrElse(source.withColumn("_del", lit(false)))
      .withColumn("_src", lit(true))
      .alias("_s")
    val cond = keys.map(k => col(s"_t.$k") === col(s"_s.$k")).reduce(_ && _)
    val isSrc = col("_s._src").isNotNull
    t.join(s, cond, "full_outer")
      .filter(!coalesce(col("_s._del"), lit(false)))
      .select(target.columns.toSeq
        .map(c => when(isSrc, col(s"_s.$c")).otherwise(col(s"_t.$c")).as(c)): _*)
  }

  /** Change batches begin at this order date. */
  val UpsertCutoff = "1999-01-01"

  /** The oracled MERGE query: refresh the customer snapshot with a
    * corpus-derived change batch — balances grow by recent order spend
    * (UPDATE), every 89th customer churns (DELETE), every 97th re-signs
    * under a relocated id (INSERT; +1e6 keeps ids disjoint from the
    * corpus). All arithmetic in exact e2 integers.
    */
  def customerUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        Exact.e(col("c_acctbal"), 2).as("bal_e2"))
    val recent = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(s"$UpsertCutoff 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("o_custkey"))
      .agg(sum(Exact.e(col("o_totalprice"), 2)).as("delta_e2"))
    val updates = cust
      .filter(col("c_custkey") % 89 =!= 0)
      .join(recent, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        (col("bal_e2") + col("delta_e2")).as("bal_e2"), lit(false).as("is_delete"))
    val deletes = cust.filter(col("c_custkey") % 89 === 0)
      .withColumn("is_delete", lit(true))
    val inserts = cust.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("NEW_"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_mktsegment"),
        lit(0L).as("bal_e2"), lit(false).as("is_delete"))
    upsert(cust, updates.unionByName(deletes).unionByName(inserts),
      Seq("c_custkey"), Some("is_delete"))
  }
}
