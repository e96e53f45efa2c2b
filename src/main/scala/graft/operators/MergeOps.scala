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

  // --------------------------------------------------------------------
  // u2: SCD-2 (slowly-changing-dimension type 2) history merge — the
  // versioned flavor of u1: instead of overwriting, a changed row CLOSES
  // the current version and appends a successor, so the table answers
  // "what did this dimension row look like when batch N ran". The
  // matched-but-UNCHANGED branch is a deliberate no-op — the same rule
  // the reference applies before PATCHing dimension options
  // (EnablePatchNodeID gate / P8: an update carrying identical values
  // must not touch the store).
  // --------------------------------------------------------------------

  /** Apply a change batch to an SCD-2 history table.
    *
    * `history` carries `keys ++ values ++ (version: long, is_current:
    * boolean)`; `source` carries `keys ++ values` (+ `deleteCol`). Rows:
    *
    *   - history rows already closed pass through untouched;
    *   - current row, no source match → unchanged;
    *   - match with every value EQUAL (null-safe) → unchanged (no-op);
    *   - match with any value changed → the current row re-emitted
    *     closed (`is_current = false`) PLUS a successor at `version + 1`;
    *   - match with `deleteCol` → closed, no successor;
    *   - source-only key → opened at version 1.
    *
    * Scale shape: u1's single full-outer join on the key (bucket both
    * sides to make it shuffle-free) over the CURRENT slice only; the
    * closed slice is a pass-through scan. The 0-2 output rows per match
    * are one array-explode — no second join, no window.
    */
  def scd2Merge(
      history: DataFrame, source: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    val meta = Seq("version", "is_current")
    val values = history.columns.toSeq.filterNot(c => keys.contains(c) || meta.contains(c))
    val outCols = keys ++ values ++ meta
    val t = history.filter(col("is_current")).alias("_t")
    val s = deleteCol
      .map(c => source.withColumnRenamed(c, "_del"))
      .getOrElse(source.withColumn("_del", lit(false)))
      .withColumn("_src", lit(true))
      .alias("_s")
    val cond = keys.map(k => col(s"_t.$k") === col(s"_s.$k")).reduce(_ && _)
    val matched = col("_t.version").isNotNull && col("_s._src").isNotNull
    val changed = values.map(v => !(col(s"_t.$v") <=> col(s"_s.$v"))).reduce(_ || _)
    def row(side: String, version: org.apache.spark.sql.Column,
        current: org.apache.spark.sql.Column) =
      struct((keys ++ values).map(c => col(s"$side.$c").as(c)) ++
        Seq(version.as("version"), current.as("is_current")): _*)
    val keepT = row("_t", col("_t.version"), lit(true))
    val closeT = row("_t", col("_t.version"), lit(false))
    val nextS = row("_s", col("_t.version") + 1L, lit(true))
    val openS = row("_s", lit(1L), lit(true))
    val arr = when(col("_s._src").isNull, array(keepT))
      .when(col("_t.version").isNull, array(openS))
      .when(matched && col("_s._del"), array(closeT))
      .when(matched && changed, array(closeT, nextS))
      .otherwise(array(keepT))
    t.join(s, cond, "full_outer")
      .select(explode(arr).as("r"))
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)
      .unionByName(history.filter(!col("is_current"))
        .select(outCols.map(col): _*))
  }

  /** Share of u1's update batch turned into deliberate NO-OPS for u2 (a
    * customer with `c_custkey % 13 == 0` re-sends its row unchanged —
    * the P8 case).
    */
  val Scd2NoOpMod = 13L

  /** The oracled SCD-2 query: the customer snapshot seeded as version-1
    * history, refreshed with u1's change batch except that every 13th
    * updated customer re-sends UNCHANGED values (exercising the no-op
    * branch). Output is the full next history.
    */
  def customerScd2(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        Exact.e(col("c_acctbal"), 2).as("bal_e2"))
    val hist = cust
      .withColumn("version", lit(1L)).withColumn("is_current", lit(true))
    val recent = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(s"$UpsertCutoff 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("o_custkey"))
      .agg(sum(Exact.e(col("o_totalprice"), 2)).as("delta_e2"))
    val updates = cust
      .filter(col("c_custkey") % 89 =!= 0)
      .join(recent, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        when(col("c_custkey") % Scd2NoOpMod === 0, col("bal_e2"))
          .otherwise(col("bal_e2") + col("delta_e2")).as("bal_e2"),
        lit(false).as("is_delete"))
    val deletes = cust.filter(col("c_custkey") % 89 === 0)
      .withColumn("is_delete", lit(true))
    val inserts = cust.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("NEW_"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_mktsegment"),
        lit(0L).as("bal_e2"), lit(false).as("is_delete"))
    scd2Merge(hist, updates.unionByName(deletes).unionByName(inserts),
      Seq("c_custkey"), Some("is_delete"))
  }

  def customerScd2OracleSql: String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
       |    cast(floor(c_acctbal * 100.0 + 0.5) AS bigint) AS bal_e2
       |  FROM customer),
       |recent AS (
       |  SELECT o_custkey,
       |    sum(cast(floor(o_totalprice * 100.0 + 0.5) AS bigint)) AS delta_e2
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '$UpsertCutoff 00:00:00'
       |  GROUP BY o_custkey),
       |updates AS (
       |  SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment,
       |    CASE WHEN c.c_custkey % $Scd2NoOpMod = 0 THEN c.bal_e2
       |         ELSE c.bal_e2 + r.delta_e2 END AS bal_e2,
       |    false AS is_delete
       |  FROM cust c JOIN recent r ON r.o_custkey = c.c_custkey
       |  WHERE c.c_custkey % 89 <> 0),
       |deletes AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, bal_e2,
       |    true AS is_delete
       |  FROM cust WHERE c_custkey % 89 = 0),
       |inserts AS (
       |  SELECT c_custkey + 1000000 AS c_custkey, 'NEW_' || c_name AS c_name,
       |    c_nationkey, c_mktsegment, cast(0 AS bigint) AS bal_e2,
       |    false AS is_delete
       |  FROM cust WHERE c_custkey % 97 = 0),
       |src AS (
       |  SELECT * FROM updates UNION ALL SELECT * FROM deletes
       |  UNION ALL SELECT * FROM inserts),
       |j AS (
       |  SELECT t.c_custkey AS tk, t.c_name AS tn, t.c_nationkey AS tnat,
       |    t.c_mktsegment AS tseg, t.bal_e2 AS tbal,
       |    s.c_custkey AS sk, s.c_name AS sn, s.c_nationkey AS snat,
       |    s.c_mktsegment AS sseg, s.bal_e2 AS sbal, s.is_delete AS del,
       |    (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND
       |     (t.c_name IS DISTINCT FROM s.c_name OR
       |      t.c_nationkey IS DISTINCT FROM s.c_nationkey OR
       |      t.c_mktsegment IS DISTINCT FROM s.c_mktsegment OR
       |      t.bal_e2 IS DISTINCT FROM s.bal_e2)) AS changed
       |  FROM cust t FULL OUTER JOIN src s ON s.c_custkey = t.c_custkey)
       |SELECT tk AS c_custkey, tn AS c_name, tnat AS c_nationkey,
       |  tseg AS c_mktsegment, tbal AS bal_e2,
       |  cast(1 AS bigint) AS version,
       |  NOT (coalesce(del, false) OR changed) AS is_current
       |FROM j WHERE tk IS NOT NULL
       |UNION ALL
       |SELECT sk, sn, snat, sseg, sbal, cast(2 AS bigint) AS version,
       |  true AS is_current
       |FROM j WHERE changed
       |UNION ALL
       |SELECT sk, sn, snat, sseg, sbal, cast(1 AS bigint) AS version,
       |  true AS is_current
       |FROM j WHERE tk IS NULL""".stripMargin
}
