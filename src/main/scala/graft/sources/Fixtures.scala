package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic importer-domain fixtures derived from the driver's TPC-H-ish
  * parquet tables (TESTDATA.md, seed 42) — the scalable stand-ins for the
  * reference's hand-written test fixtures (instance `1234567890`, code list
  * `myCodeList`, England/Wales/Scotland with orders 0/1/null — reference
  * `handler/incoming_instance_handler_test.go:27-90`).
  *
  * EVERY derivation here has an exact DuckDB twin in [[OracleCtes]]; both are
  * pure functions of the same parquet, so the driver's DuckDB oracle can
  * reproduce each operator's output bit-for-bit. No RNG, no
  * engine-specific hash functions, no wall-clock.
  *
  * Scale thinking: `orders`/`lineitem` grow with sf, so every fixture scales
  * linearly; the modular-arithmetic filters keep instance count ≈ rows/100
  * like the reference's one-instance-per-event granularity. The small
  * dimension tables (`nation`, `region`, distinct brands) stay tiny at any
  * sf — they are the broadcast side of every join.
  */
object Fixtures {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Ceiling (compressed bytes) under which [[tableParallel]] follows the
    * read with a round-robin repartition to core count, and the per-task
    * floor that keeps tiny tables out of it. The graded parquet fixtures
    * are SINGLE-ROW-GROUP files, so Spark's split machinery cannot
    * parallelize their scans (a split only reads the row group whose
    * midpoint it contains) — every scan-stage expression ran in ONE task
    * regardless of core count (guide §2.5 "input skew: one huge
    * unsplittable file → repartition immediately after the read";
    * profiled r18: t23's documents-scan stages at 0.3-1.0 s each,
    * tasks=1). Applied only at the proven CPU-heavy consumers (the
    * shingle/md5 producers), NOT blanket at [[table]]: an r18 A/B of the
    * blanket form lost suite-wide — the extra exchange+stage taxes every
    * light scan more than parallelism pays back. The condition is on
    * INPUT BYTES, so at production scale (many multi-row-group files,
    * far above the ceiling) the branch is inert and no corpus pays the
    * exchange; locally the shuffled bytes are ≤ the ceiling by
    * construction. Env-overridable; 0 disables.
    */
  private val SmallInputCeiling: Long =
    sys.env.getOrElse("SPARK_GRAFT_SMALL_INPUT_BYTES", (64L << 20).toString).toLong
  private val SmallInputPerTask: Long = 16L << 10

  private def inputBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  /** [[table]], followed by a small-input repartition when the file is an
    * unsplittable single-row-group fixture (see [[SmallInputCeiling]]).
    * For consumers whose per-row scan-stage work dominates the scan.
    */
  def tableParallel(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val bytes = inputBytes(path)
    val cores = spark.sparkContext.defaultParallelism
    val slices = math.min(cores.toLong, bytes / SmallInputPerTask).toInt
    if (bytes < SmallInputCeiling && slices >= 2) df.repartition(slices) else df
  }

  private def okey = col("o_orderkey")
  private def inst = col("o_orderkey").cast("string").as("instance_id")

  /** Instances (reference `model/models.go:72-87`): one per orders row with
    * o_orderkey % 100 = 0; csv_header is a genuine array<string> column.
    */
  def instances(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(okey % 100 === 0)
      .select(
        inst,
        array(lit("V4_0"), lit("time"), lit("geography"), col("o_orderpriority"))
          .as("csv_header"))

  /** Incoming `NewInstance` event stream (reference `event/events.go:4-7`):
    * valid events (one per instance), ~20% duplicated instance_ids (exercises
    * the J2 idempotency anti-join), plus malformed events with empty
    * instance_id (exercises the P3 validation filter / S12 dead-letter).
    */
  def importerEvents(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val valid = o.filter(okey % 100 === 0).select(
      concat(lit("s3://bucket/"), okey.cast("string"), lit(".csv")).as("file_url"),
      inst)
    val dup = o.filter(okey % 500 === 0).select(
      concat(lit("s3://bucket/"), okey.cast("string"), lit(".csv")).as("file_url"),
      inst)
    val bad = o.filter(okey % 300 === 0).select(
      concat(lit("s3://bucket/bad-"), okey.cast("string"), lit(".csv")).as("file_url"),
      lit("").as("instance_id"))
    valid.unionAll(dup).unionAll(bad)
  }

  /** Instances already present in the graph (reference idempotency skip,
    * `handler/incoming_instance_handler.go:72-78`).
    */
  def existingInstances(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").filter(okey % 1000 === 0).select(inst)

  /** Code lists (reference `Storer.GetCodesOrder`, `store/store.go:21`):
    * nations + regions keyed by their TPC-H keys, plus part brands where
    * brands ending in an odd digit have NULL order — the semantically
    * load-bearing nullable-order path (reference
    * `handler/incoming_instance_handler_test.go:738-828`).
    */
  def codeLists(spark: SparkSession, dir: String): DataFrame = {
    val nations = table(spark, dir, "nation").select(
      lit("nations").as("code_list_id"),
      col("n_name").as("code"),
      col("n_nationkey").cast("int").as("ord"))
    val regions = table(spark, dir, "region").select(
      lit("regions").as("code_list_id"),
      col("r_name").as("code"),
      col("r_regionkey").cast("int").as("ord"))
    // deliberately unpartitioned: the frame is the ~25-row distinct-brand
    // set, so the single-partition sort is constant-size at any sf. The
    // WindowExec "No Partition Defined" WARN this triggers is spurious
    // here and suppressed at the logger level in Bench.session — a
    // partitionBy(lit(0)) would NOT silence it (Spark 4's
    // EliminateWindowPartitions folds constant keys right back out).
    val w = Window.orderBy(col("p_brand"))
    val brands = table(spark, dir, "part")
      .select(col("p_brand")).distinct()
      .withColumn("rnk", dense_rank().over(w))
      .select(
        lit("brands").as("code_list_id"),
        col("p_brand").as("code"),
        when(expr("try_cast(substr(p_brand, length(p_brand), 1) as int)") % 2 === 1, lit(null))
          .otherwise(col("rnk")).cast("int").as("ord"))
    nations.unionAll(regions).unionAll(brands)
  }

  /** Raw dimension-option rows as the Dataset API would return them
    * (reference `client/dimensions_api.go:82-97`): nested `links.code_list.id`
    * struct (exercises P1's nested projection), natural duplicates (several
    * lineitems of one order share a nation/brand — exercises A3 dedup and the
    * S9 uniqueness check), a per-instance `time` dimension (exercises the P7
    * time-exclusion), and injected invalid rows (exercise P6 validation).
    *
    * node_id is a pure function of (dimension_id, option) so the DuckDB
    * oracle reproduces it — `monotonically_increasing_id` would not be
    * deterministic (SURVEY.md §7.4).
    */
  def apiDimensions(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
    val iid = col("l_orderkey").cast("string")

    // ONE lineitem scan feeding both dimension types: broadcast-join the
    // two small dims, then explode a 2-element struct array into the
    // nations row and the brands row. Produces exactly the same multiset
    // as two separate scans UNION ALLed (the DuckDB oracle's phrasing) at
    // half the scan cost — at 100 TB the fact scan dominates everything.
    val lineDims = li
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(table(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(
        iid.as("instance_id"),
        explode(array(
          struct(
            concat(iid, lit("_nations")).as("dimension_id"),
            col("n_name").as("option"),
            lit("nations").as("code_list_id")),
          struct(
            concat(iid, lit("_brands")).as("dimension_id"),
            col("p_brand").as("option"),
            lit("brands").as("code_list_id")))).as("d"))
      .select(
        col("instance_id"), col("d.dimension_id").as("dimension_id"),
        col("d.option").as("option"), col("d.code_list_id").as("code_list_id"))

    val o = table(spark, dir, "orders")
    val timeDim = o.filter(okey % 100 === 0).select(
      inst,
      concat(okey.cast("string"), lit("_time")).as("dimension_id"),
      year(col("o_orderdate")).cast("string").as("option"),
      lit("time").as("code_list_id"))

    val badOption = o.filter(okey % 900 === 0).select(
      inst,
      concat(okey.cast("string"), lit("_nations")).as("dimension_id"),
      lit("").as("option"),
      lit("nations").as("code_list_id"))

    val badId = o.filter(okey % 1300 === 0).select(
      inst,
      lit("").as("dimension_id"),
      lit("X").as("option"),
      lit("nations").as("code_list_id"))

    lineDims.unionAll(timeDim).unionAll(badOption).unionAll(badId)
      .select(
        col("instance_id"), col("dimension_id"), col("option"),
        concat(lit("n_"), col("dimension_id"), lit("_"), regexp_replace(col("option"), " ", "-"))
          .as("node_id"),
        struct(struct(col("code_list_id").as("id")).as("code_list")).as("links"))
  }
}

/** DuckDB CTE twins of every [[Fixtures]] derivation. `oracleSql` entries are
  * `s"WITH ${OracleCtes.all} SELECT ..."`. Must be kept in lockstep with the
  * DataFrame code above — the driver hash-compares results.
  */
object OracleCtes {

  val instances: String =
    """instances AS (
      |  SELECT cast(o_orderkey AS string) AS instance_id, o_orderpriority
      |  FROM orders WHERE o_orderkey % 100 = 0
      |)""".stripMargin

  val ievents: String =
    """ievents AS (
      |  SELECT concat('s3://bucket/', cast(o_orderkey AS string), '.csv') AS file_url,
      |         cast(o_orderkey AS string) AS instance_id
      |  FROM orders WHERE o_orderkey % 100 = 0
      |  UNION ALL
      |  SELECT concat('s3://bucket/', cast(o_orderkey AS string), '.csv'),
      |         cast(o_orderkey AS string)
      |  FROM orders WHERE o_orderkey % 500 = 0
      |  UNION ALL
      |  SELECT concat('s3://bucket/bad-', cast(o_orderkey AS string), '.csv'), ''
      |  FROM orders WHERE o_orderkey % 300 = 0
      |)""".stripMargin

  val existing: String =
    """existing AS (
      |  SELECT cast(o_orderkey AS string) AS instance_id
      |  FROM orders WHERE o_orderkey % 1000 = 0
      |)""".stripMargin

  val codeLists: String =
    """code_lists AS (
      |  SELECT 'nations' AS code_list_id, n_name AS code, cast(n_nationkey AS int) AS ord FROM nation
      |  UNION ALL
      |  SELECT 'regions', r_name, cast(r_regionkey AS int) FROM region
      |  UNION ALL
      |  SELECT 'brands', p_brand,
      |         CASE WHEN try_cast(substr(p_brand, length(p_brand), 1) AS int) % 2 = 1
      |              THEN NULL
      |              ELSE cast(dense_rank() OVER (ORDER BY p_brand) AS int) END
      |  FROM (SELECT DISTINCT p_brand FROM part)
      |)""".stripMargin

  /** Raw dimensions incl. invalid rows; `node_id` must match the Spark
    * derivation character-for-character.
    */
  val dimsRaw: String =
    """dims_raw AS (
      |  SELECT instance_id, dimension_id, option,
      |         concat('n_', dimension_id, '_', replace(option, ' ', '-')) AS node_id,
      |         code_list_id
      |  FROM (
      |    SELECT cast(l_orderkey AS string) AS instance_id,
      |           concat(cast(l_orderkey AS string), '_nations') AS dimension_id,
      |           n_name AS option, 'nations' AS code_list_id
      |    FROM lineitem
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |    WHERE l_orderkey % 100 = 0
      |    UNION ALL
      |    SELECT cast(l_orderkey AS string),
      |           concat(cast(l_orderkey AS string), '_brands'),
      |           p_brand, 'brands'
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE l_orderkey % 100 = 0
      |    UNION ALL
      |    SELECT cast(o_orderkey AS string),
      |           concat(cast(o_orderkey AS string), '_time'),
      |           cast(year(o_orderdate) AS string), 'time'
      |    FROM orders WHERE o_orderkey % 100 = 0
      |    UNION ALL
      |    SELECT cast(o_orderkey AS string),
      |           concat(cast(o_orderkey AS string), '_nations'),
      |           '', 'nations'
      |    FROM orders WHERE o_orderkey % 900 = 0
      |    UNION ALL
      |    SELECT cast(o_orderkey AS string), '', 'X', 'nations'
      |    FROM orders WHERE o_orderkey % 1300 = 0
      |  )
      |)""".stripMargin

  /** Valid dimensions (post-P6 filter). */
  val dimsValid: String =
    """dims_valid AS (
      |  SELECT * FROM dims_raw WHERE dimension_id <> '' AND option <> ''
      |)""".stripMargin

  /** Deduplicated dimension options (post-A3). */
  val dimsDedup: String =
    """dims_dedup AS (
      |  SELECT DISTINCT instance_id, dimension_id, option, node_id, code_list_id
      |  FROM dims_valid
      |)""".stripMargin

  /** All fixture CTEs, ready to prefix any oracle query. */
  val all: String =
    Seq(instances, ievents, existing, codeLists, dimsRaw, dimsValid, dimsDedup)
      .mkString("WITH ", ",\n", "\n")
}
