package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ImporterPipeline._
import graft.sources.{Fixtures, OracleCtes}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or one of
  * the large-scale training-data extensions), expressed DataFrame-first;
  * each entry in [[oracleSql]] is the DuckDB twin over the same parquet.
  * Column names and types are aligned on both sides because the driver
  * hash-compares values after sorting columns by name.
  */
object SparkEntry {

  /** Flagship query (reference pipeline end-to-end, SURVEY.md §3.1): events
    * → validate → idempotency anti-join → dimensions for the new instances
    * → dedup → order lookup → PATCH payload. Driver smoke-checks rows>0 on
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    flagship(spark, "/root/testdata/sf0.001")

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val events = Fixtures.importerEvents(spark, dir)
    val newInst = newInstanceEvents(validEvents(events), Fixtures.existingInstances(spark, dir))
    val dims = dedupOptions(validDimensions(projectDimensions(Fixtures.apiDimensions(spark, dir))))
    val forNew = dims.join(newInst.select("instance_id"), Seq("instance_id"), "left_semi")
    optionUpdates(withOrder(forNew, Fixtures.codeLists(spark, dir)), enablePatchNodeId = true)
  }

  private def dimsValid(spark: SparkSession, dir: String): DataFrame =
    validDimensions(projectDimensions(Fixtures.apiDimensions(spark, dir)))

  private def dimsDedup(spark: SparkSession, dir: String): DataFrame =
    dedupOptions(dimsValid(spark, dir))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- P3: event validation filter ---
    "p3_validate_events" -> ((s, d) => validEvents(Fixtures.importerEvents(s, d))),
    // --- S12: dead-letter side output ---
    "s12_dead_letter" -> ((s, d) => deadLetters(Fixtures.importerEvents(s, d))),
    // --- J2: idempotency left-anti join ---
    "j2_new_instances" -> ((s, d) =>
      newInstanceEvents(validEvents(Fixtures.importerEvents(s, d)), Fixtures.existingInstances(s, d))),
    // --- P1: nested-struct projection API→DB ---
    "p1_project_dimensions" -> ((s, d) => projectDimensions(Fixtures.apiDimensions(s, d))),
    // --- P2: instance projection (array column) ---
    "p2_project_instances" -> ((s, d) => projectInstances(Fixtures.instances(s, d))),
    // --- P6: dimension validation with per-branch error messages ---
    "p6_invalid_dimensions" -> ((s, d) =>
      invalidDimensions(projectDimensions(Fixtures.apiDimensions(s, d)))),
    // --- P9: dimension-name extraction (scalar string fn) ---
    "p9_dimension_names" -> ((s, d) => dimensionNames(dimsValid(s, d))),
    // --- A3: dedup (replaces reference's insert cache) ---
    "a3_dedup_options" -> ((s, d) => dimsDedup(s, d)),
    // --- A1: hash group-by codes per code list ---
    "a1_codes_by_list" -> ((s, d) => codesByList(dimsDedup(s, d))),
    // --- J1: left-outer broadcast order lookup (nullable ord) ---
    "j1_order_lookup" -> ((s, d) => withOrder(dimsDedup(s, d), Fixtures.codeLists(s, d))),
    // --- P8: no-op update filter with EnablePatchNodeID=false ---
    "p8_option_updates_no_nodeid" -> ((s, d) =>
      optionUpdates(withOrder(dimsDedup(s, d), Fixtures.codeLists(s, d)), enablePatchNodeId = false)),
    // --- P7+J3: time-exclusion + edge-construction join ---
    "j3_code_edges" -> ((s, d) => codeEdges(dimsDedup(s, d), Fixtures.codeLists(s, d))),
    // --- S5/S6: graph node sink ---
    "s5_graph_nodes" -> ((s, d) =>
      graphNodes(projectInstances(Fixtures.instances(s, d)), dimsDedup(s, d))),
    // --- S8/A5: per-instance dimension array ---
    "a5_instance_dimensions" -> ((s, d) => instanceDimensions(dimsDedup(s, d))),
    // --- S9: uniqueness-constraint check (violations on the raw feed) ---
    "s9_unique_violations" -> ((s, d) =>
      uniquenessViolations(dimsValid(s, d), Seq("instance_id", "dimension_id", "option"))),
    // --- S11: completed-event projection ---
    "s11_completed_events" -> ((s, d) =>
      completedEvents(newInstanceEvents(validEvents(Fixtures.importerEvents(s, d)),
        Fixtures.existingInstances(s, d)))),
    // --- flagship end-to-end ---
    "flagship_updates" -> ((s, d) => flagship(s, d)),
  )

  private val W = OracleCtes.all

  /** DuckDB oracle for each query; same column names/types as the Spark side. */
  def oracleSql: Map[String, String] = Map(
    "p3_validate_events" ->
      s"""$W SELECT file_url, instance_id FROM ievents WHERE length(instance_id) > 0""",
    "s12_dead_letter" ->
      s"""$W SELECT file_url, instance_id,
         |  'unable to process message' AS err_context,
         |  'validation error: instance_id is empty' AS error
         |FROM ievents WHERE length(instance_id) = 0""".stripMargin,
    "j2_new_instances" ->
      s"""$W SELECT DISTINCT file_url, instance_id FROM ievents
         |WHERE length(instance_id) > 0
         |  AND instance_id NOT IN (SELECT instance_id FROM existing)""".stripMargin,
    "p1_project_dimensions" ->
      s"""$W SELECT instance_id, dimension_id, option, node_id, code_list_id FROM dims_raw""",
    "p2_project_instances" ->
      s"""$W SELECT instance_id,
         |  4 AS header_len,
         |  concat('V4_0,time,geography,', o_orderpriority) AS header_csv
         |FROM instances""".stripMargin,
    "p6_invalid_dimensions" ->
      s"""$W SELECT instance_id, dimension_id, option,
         |  CASE WHEN dimension_id = '' AND option = ''
         |         THEN 'dimension invalid: empty dimension_id and option'
         |       WHEN dimension_id = '' THEN 'dimension id is required but was empty'
         |       WHEN option = '' THEN 'dimension value is required but was empty'
         |  END AS validation_error
         |FROM dims_raw WHERE dimension_id = '' OR option = ''""".stripMargin,
    "p9_dimension_names" ->
      s"""$W SELECT DISTINCT dimension_id,
         |  replace(concat('_', dimension_id), concat('_', instance_id, '_'), '') AS name
         |FROM dims_valid""".stripMargin,
    "a3_dedup_options" ->
      s"""$W SELECT instance_id, dimension_id, option, node_id, code_list_id FROM dims_dedup""",
    "a1_codes_by_list" ->
      s"""$W SELECT code_list_id, cast(count(*) AS bigint) AS n_options,
         |  array_to_string(list_sort(list(DISTINCT option)), ',') AS options_csv
         |FROM dims_dedup GROUP BY code_list_id""".stripMargin,
    "j1_order_lookup" ->
      s"""$W SELECT d.instance_id, d.dimension_id, d.option, d.node_id, d.code_list_id, c.ord
         |FROM dims_dedup d
         |LEFT JOIN code_lists c
         |  ON d.code_list_id = c.code_list_id AND d.option = c.code""".stripMargin,
    "p8_option_updates_no_nodeid" ->
      s"""$W SELECT d.instance_id,
         |  replace(concat('_', d.dimension_id), concat('_', d.instance_id, '_'), '') AS name,
         |  d.option, '' AS node_id, c.ord
         |FROM dims_dedup d
         |LEFT JOIN code_lists c
         |  ON d.code_list_id = c.code_list_id AND d.option = c.code
         |WHERE c.ord IS NOT NULL""".stripMargin,
    "j3_code_edges" ->
      s"""$W SELECT concat('option/', d.dimension_id, '/', d.option) AS src,
         |  concat('code/', d.code_list_id, '/', c.code) AS dst,
         |  'usedBy' AS rel_type
         |FROM dims_dedup d
         |JOIN code_lists c
         |  ON d.code_list_id = c.code_list_id AND d.option = c.code
         |WHERE replace(concat('_', d.dimension_id), concat('_', d.instance_id, '_'), '') <> 'time'""".stripMargin,
    "s5_graph_nodes" ->
      s"""$W SELECT concat('instance/', instance_id) AS id, 'Instance' AS label,
         |  concat('V4_0,time,geography,', o_orderpriority) AS props
         |FROM instances
         |UNION ALL
         |SELECT concat('option/', dimension_id, '/', option), 'DimensionOption', node_id
         |FROM dims_dedup""".stripMargin,
    "a5_instance_dimensions" ->
      s"""$W SELECT instance_id, cast(count(*) AS bigint) AS n_dims,
         |  array_to_string(list_sort(list(concat(dimension_id, ':', option))), '|') AS dims_digest
         |FROM dims_dedup GROUP BY instance_id""".stripMargin,
    "s9_unique_violations" ->
      s"""$W SELECT instance_id, dimension_id, option, cast(count(*) AS bigint) AS n
         |FROM dims_valid GROUP BY instance_id, dimension_id, option
         |HAVING count(*) > 1""".stripMargin,
    "s11_completed_events" ->
      s"""$W SELECT DISTINCT file_url, instance_id FROM ievents
         |WHERE length(instance_id) > 0
         |  AND instance_id NOT IN (SELECT instance_id FROM existing)""".stripMargin,
    "flagship_updates" ->
      s"""$W SELECT d.instance_id,
         |  replace(concat('_', d.dimension_id), concat('_', d.instance_id, '_'), '') AS name,
         |  d.option, d.node_id, c.ord
         |FROM dims_dedup d
         |LEFT JOIN code_lists c
         |  ON d.code_list_id = c.code_list_id AND d.option = c.code
         |WHERE d.instance_id IN (
         |  SELECT instance_id FROM ievents
         |  WHERE length(instance_id) > 0
         |    AND instance_id NOT IN (SELECT instance_id FROM existing))
         |  AND (d.node_id <> '' OR c.ord IS NOT NULL)""".stripMargin,
  )
}
