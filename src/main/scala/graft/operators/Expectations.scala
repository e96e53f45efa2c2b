package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures.table

/** Declarative data-quality expectations — the validation gate a corpus
  * passes before anything trains on it (the unit-tests-for-data idea of
  * Schelter et al. 2018, "Automating Large-Scale Data Quality
  * Verification", VLDB — public Amazon deequ paper; no code from it).
  *
  * Two scale shapes, both minimal by construction:
  *   - column expectations (completeness, uniqueness, accepted values,
  *     bounds) collapse to ONE aggregation pass over the table — every
  *     observed statistic is a conditional sum/min/max/count-distinct in
  *     the same `agg`, so a 100 TB corpus pays a single scan and a
  *     1-row result regardless of how many checks ride it;
  *   - the referential-integrity check is one anti-join count (the price
  *     of FK validation — there is no cheaper shape), left-semi-pruned to
  *     the key columns so the scan reads two integer columns.
  *
  * Output is the long-form report a pipeline alerts on: one row per
  * check, `(check, subject, observed, threshold, passed)`. Units are
  * exact integers per check: fraction-valued checks report e6 fractions
  * (`x · 1e6 div n` — integer div, oracle-replayable), bound checks
  * report the raw observed value against the raw bound.
  */
object Expectations {

  private[operators] val AcceptedLangs = Seq("en", "es", "de", "fr", "zh")
  private[operators] val MaxCharsBound = 2000L

  /** t40: the corpus expectation report. */
  def dataExpectations(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val agg = d.agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNotNull && length(col("text")) > 0, 1L).otherwise(0L))
        .as("n_text"),
      sum(when(col("lang").isin(AcceptedLangs: _*), 1L).otherwise(0L)).as("n_lang_ok"),
      countDistinct(col("doc_id")).as("n_doc_distinct"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(when(col("n_chars") === length(col("text")), 1L).otherwise(0L))
        .as("n_chars_consistent"))
    // FK: every lineitem order key must resolve; one anti-join count over
    // two pruned integer columns
    val orphans = table(spark, dir, "lineitem").select(col("l_orderkey"))
      .join(table(spark, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    // long form: stack over the 1-row frames — constant-size work
    agg.crossJoin(orphans).select(expr(
      s"""stack(7,
         |  'completeness', 'documents.text', (n_text * 1000000) div n, 1000000L,
         |    n_text = n,
         |  'uniqueness', 'documents.doc_id', (n_doc_distinct * 1000000) div n, 1000000L,
         |    n_doc_distinct = n,
         |  'accepted_values', 'documents.lang', (n_lang_ok * 1000000) div n, 1000000L,
         |    n_lang_ok = n,
         |  'consistency', 'documents.n_chars = length(text)',
         |    (n_chars_consistent * 1000000) div n, 1000000L, n_chars_consistent = n,
         |  'min_bound', 'documents.n_chars', min_chars, 1L, min_chars >= 1,
         |  'max_bound', 'documents.n_chars', max_chars, ${MaxCharsBound}L,
         |    max_chars <= ${MaxCharsBound}L,
         |  'referential_integrity', 'lineitem.l_orderkey -> orders.o_orderkey',
         |    n_orphans, 0L, n_orphans = 0
         |) AS (check_name, subject, observed, threshold, passed)""".stripMargin))
      .select(col("check_name"), col("subject"),
        col("observed").cast("bigint").as("observed"),
        col("threshold").cast("bigint").as("threshold"), col("passed"))
  }

  def dataExpectationsOracleSql: String =
    s"""WITH agg AS (
       |  SELECT count(*) AS n,
       |    sum(CASE WHEN text IS NOT NULL AND len(text) > 0 THEN 1 ELSE 0 END) AS n_text,
       |    sum(CASE WHEN lang IN (${AcceptedLangs.map("'" + _ + "'").mkString(", ")})
       |        THEN 1 ELSE 0 END) AS n_lang_ok,
       |    count(DISTINCT doc_id) AS n_doc_distinct,
       |    min(n_chars) AS min_chars,
       |    max(n_chars) AS max_chars,
       |    sum(CASE WHEN n_chars = len(text) THEN 1 ELSE 0 END) AS n_chars_consistent
       |  FROM documents),
       |orph AS (
       |  SELECT count(*) AS n_orphans FROM lineitem l
       |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
       |rows_out AS (
       |  SELECT 'completeness' AS check_name, 'documents.text' AS subject,
       |    (n_text * 1000000) // n AS observed, 1000000 AS threshold,
       |    n_text = n AS passed FROM agg
       |  UNION ALL SELECT 'uniqueness', 'documents.doc_id',
       |    (n_doc_distinct * 1000000) // n, 1000000, n_doc_distinct = n FROM agg
       |  UNION ALL SELECT 'accepted_values', 'documents.lang',
       |    (n_lang_ok * 1000000) // n, 1000000, n_lang_ok = n FROM agg
       |  UNION ALL SELECT 'consistency', 'documents.n_chars = length(text)',
       |    (n_chars_consistent * 1000000) // n, 1000000, n_chars_consistent = n FROM agg
       |  UNION ALL SELECT 'min_bound', 'documents.n_chars',
       |    min_chars, 1, min_chars >= 1 FROM agg
       |  UNION ALL SELECT 'max_bound', 'documents.n_chars',
       |    max_chars, $MaxCharsBound, max_chars <= $MaxCharsBound FROM agg
       |  UNION ALL SELECT 'referential_integrity',
       |    'lineitem.l_orderkey -> orders.o_orderkey',
       |    n_orphans, 0, n_orphans = 0 FROM orph)
       |SELECT cast(check_name AS varchar) AS check_name, cast(subject AS varchar) AS subject,
       |  cast(observed AS bigint) AS observed, cast(threshold AS bigint) AS threshold,
       |  passed
       |FROM rows_out""".stripMargin
}
