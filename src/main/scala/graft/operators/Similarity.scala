package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineF, dotF}
import graft.sources.Fixtures.table

/** Similarity search over the `embeddings` table (array<float>, dim 64).
  *
  * Two paths, per the standard ANN playbook:
  *   - brute-force cosine top-k: the exact baseline. O(queries × corpus);
  *     at 100 TB this is a broadcast of the (small) query set against a
  *     partitioned corpus scan — embarrassingly parallel, no shuffle until
  *     the final per-query top-k (which AQE keeps tiny).
  *   - LSH (random hyperplane) bucketing: corpus is pre-bucketed by sign
  *     pattern; queries probe only their bucket. Candidate set shrinks
  *     ~2^planes-fold; recall tunable by probing neighboring buckets.
  *
  * The dot/norm kernels are custom codegen expressions (double accumulator
  * in index order) so the DuckDB oracle can replay the exact arithmetic.
  */
object Similarity {

  private val NumQueries = 8
  private val TopK = 10

  /** Exact brute-force cosine top-k for the first [[NumQueries]] vectors.
    * Ranking key is cosine rounded to 6dp with vec_id tie-break —
    * deterministic across engines and summation orders.
    */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cos = cosineF(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid")).orderBy(Exact.e(cos, 6).desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), Exact.e(cos, 4).as("cosine_e4"), col("rn").cast("int").as("rn"))
  }

  // 2^NumPlanes buckets; keep buckets populated (corpus_size >> 2^planes)
  // so probes see real candidate sets — raise for bigger corpora.
  private val NumPlanes = 6

  /** Deterministic random hyperplanes (seed 42): the scale path's shared
    * projection basis, generated once on the driver and broadcast as
    * literals into codegen.
    */
  private def planes: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Array.fill(64)(rnd.nextGaussian().toFloat))
  }

  /** DuckDB oracle for [[lshBuckets]]: the plane constants are
    * deterministic literals, so the oracle inlines them as FLOAT[] values
    * and replays the same index-ordered double dot products.
    */
  def lshBucketsOracleSql: String = {
    val planeRows = planes.zipWithIndex.map { case (p, j) =>
      s"($j, [${p.map(_.toString).mkString(", ")}]::FLOAT[])"
    }.mkString(",\n    ")
    s"""WITH planes(j, plane) AS (VALUES
       |    $planeRows),
       |dots AS (
       |  SELECT e.vec_id, e.label, p.j,
       |    sum(cast(e.embedding[i] AS double) * cast(p.plane[i] AS double)) AS d
       |  FROM embeddings e, planes p,
       |       LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) r
       |  GROUP BY e.vec_id, e.label, p.j)
       |SELECT vec_id, label,
       |  cast(sum(CASE WHEN d > 0 THEN cast(1 AS bigint) << j ELSE 0 END) AS bigint) AS bucket
       |FROM dots GROUP BY vec_id, label""".stripMargin
  }

  /** Sign-pattern bucket id for every vector: bit j = sign(v · plane_j). */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val planeCols = planes.map(p => array(p.toSeq.map(v => lit(v)): _*).cast("array<float>"))
    val bucket = planeCols.zipWithIndex
      .map { case (p, j) => when(dotF(col("embedding"), p) > 0, lit(1L << j)).otherwise(lit(0L)) }
      .reduce(_ + _)
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), bucket.as("bucket"))
  }

  /** Bucketed ANN: queries probe only their own bucket; exact cosine within
    * the bucket, top-5 per query. Trades recall for a ~2^planes candidate
    * reduction — the 100 TB path where brute force is off the table.
    */
  def lshAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val buckets = lshBuckets(spark, dir)
    val withVec = buckets.join(emb, "vec_id")
    val queries = withVec.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("bucket").as("qbucket"), col("embedding").as("qe"))
    val cos = cosineF(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid")).orderBy(round(cos, 6).desc, col("vec_id"))
    withVec.join(broadcast(queries), col("bucket") === col("qbucket"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"), round(cos, 4).as("cosine"), col("rn").cast("int").as("rn"))
  }

  /** Embedding-cosine near-duplicate pairs among the corpus: LSH-bucketed
    * all-pairs within buckets, keep cosine ≥ threshold. The embedding
    * counterpart of MinHash dedup.
    */
  def embeddingNearDuplicates(spark: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    val withVec = lshBuckets(spark, dir).join(table(spark, dir, "embeddings"), "vec_id")
    val cos = cosineF(col("x.embedding"), col("y.embedding"))
    withVec.as("x").join(withVec.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .filter(cos >= threshold)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), round(cos, 4).as("cosine"))
  }

  /** Per-vector norms — the sanity/statistics pass over the embedding
    * column, oracle-checked (same double arithmetic via unnest in DuckDB).
    */
  def embeddingNorms(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings").select(
      col("vec_id"), col("label"),
      Exact.e(graft.functions.VectorFunctions.l2normF(col("embedding")), 4).as("l2_norm_e4"))
}
