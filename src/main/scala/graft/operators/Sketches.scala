package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Count-min sketch (Cormode & Muthukrishnan 2005, public) over the
  * [[PortableHash]] affine family — the PORTABLE sketch counterpart of
  * a6's HLL and a7's percentile sketch: because the row hashes are
  * engine-replayable, the counter table AND every estimate derived from
  * it hash-check exactly against an external SQL oracle, where the
  * built-in binary sketches can only take rows-only checks.
  *
  * Scale shape: the counter build is one explode(depth) + groupBy —
  * map-side partial aggregation collapses each partition to ≤ depth·width
  * rows before the shuffle, so the exchanged volume is the SKETCH size,
  * not the data size; that is the whole point of a mergeable sketch at
  * 100 TB. Estimates join candidates against the depth·width counter
  * table (broadcast — it is bounded by construction) and take the
  * per-candidate min across rows.
  *
  * Reference anchor: the importer's only aggregation-for-monitoring is
  * an exact count (handler/incoming_instance_handler.go:60, the
  * dimensions_count log field); CMS is the beyond-reference
  * generalization to heavy-hitter monitoring under bounded memory.
  */
object Sketches {

  /** Sketch rows: each key is counted in one bucket per row; estimate =
    * min across rows. 4×64 keeps collisions real on the test corpus (150
    * users) while bounding overestimate by ~N/width per row.
    */
  val Depth = 4
  val Width = 64

  private def bucketStructs = (0 until Depth).map { i =>
    struct(lit(i).as("r"), (PortableHash.permCol(i, col("x")) % Width).as("b"))
  }

  /** The counter table (r, b, cnt): depth·width rows max. */
  def cmsCounters(spark: SparkSession, dir: String): DataFrame =
    RelationalOps.eventsTable(spark, dir)
      .select((PortableHash.md5Prefix60(col("user_id").cast("string")) % PortableHash.P).as("x"))
      .select(explode(array(bucketStructs: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a deterministic candidate set (user_id <
    * `maxUser`), alongside exact counts: est ≥ exact always (one-sided
    * error), est − exact bounded by row collisions. The counter table is
    * broadcast; the exact side is the only data-sized aggregation.
    */
  def cmsUserEstimates(spark: SparkSession, dir: String, maxUser: Long = 30L): DataFrame = {
    val counters = cmsCounters(spark, dir)
    val exact = RelationalOps.eventsTable(spark, dir)
      .filter(col("user_id") < maxUser)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    exact
      .withColumn("x", PortableHash.md5Prefix60(col("user_id").cast("string")) % PortableHash.P)
      .select(col("user_id"), col("exact_n"), explode(array(bucketStructs: _*)).as("rb"))
      .select(col("user_id"), col("exact_n"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** DuckDB twin of [[cmsUserEstimates]]: same base hash, same affine
    * buckets, same min-across-rows estimate.
    */
  def cmsOracleSql(maxUser: Long = 30L): String = {
    val p = PortableHash.P
    val buckets = (0 until Depth).map { i =>
      s"SELECT user_id, $i AS r, (${PortableHash.duckPerm(i, "x")}) % $Width AS b FROM hx"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH hx0 AS (
       |  SELECT user_id,
       |    ${PortableHash.duckMd5Prefix60("user_id::VARCHAR")} % $p AS x
       |  FROM events),
       |hx AS (SELECT DISTINCT user_id, x FROM hx0),
       |ev_buckets AS (
       |  $buckets),
       |counters AS (
       |  SELECT eb.r, eb.b, count(*) AS cnt
       |  FROM events e JOIN ev_buckets eb USING (user_id)
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT user_id, count(*) AS exact_n FROM events
       |  WHERE user_id < $maxUser GROUP BY user_id)
       |SELECT x.user_id, x.exact_n, min(c.cnt) AS cms_est
       |FROM exact x
       |JOIN ev_buckets eb ON eb.user_id = x.user_id
       |JOIN counters c ON c.r = eb.r AND c.b = eb.b
       |GROUP BY 1, 2""".stripMargin
  }
}
