package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineF, dotF}
import graft.sources.Fixtures.table

/** IVF (inverted-file) ANN — the coarse-quantizer scale path next to the
  * LSH variant in [[Similarity]]:
  *
  *   1. TRAIN: pick k centroids with a deterministic k-means-lite
  *      (seeded init = first k vectors by vec_id, fixed iteration count,
  *      mean update). Centroids are tiny → computed once, broadcast.
  *   2. ASSIGN: every corpus vector goes to its nearest centroid — one
  *      map-only pass (broadcast centroids, codegen dot kernels), giving
  *      the inverted lists.
  *   3. QUERY: probe the `nprobe` nearest lists only — the candidate set
  *      shrinks ~k/nprobe-fold vs brute force.
  *
  * At 100 TB the corpus scan in step 2 is the only big job (embarrassingly
  * parallel); step 3 touches |corpus|·nprobe/k vectors. Training on a
  * sample (here: the whole small table; production: `df.sample`) is the
  * standard practice.
  */
object IvfAnn {

  private val K = 16
  private val Iterations = 3
  private val NProbe = 4
  private val NumQueries = 8
  private val TopK = 10

  /** Deterministic k-means-lite on the driver over a (small) training
    * sample — collect is bounded by the sample size, never the corpus.
    */
  private[operators] def trainCentroids(sample: Array[(Long, Array[Float])]): Array[Array[Float]] = {
    val dim = sample.head._2.length
    var centroids = sample.sortBy(_._1).take(K).map(_._2.map(_.toDouble))
    for (_ <- 0 until Iterations) {
      val sums = Array.fill(K)(new Array[Double](dim))
      val counts = new Array[Int](K)
      sample.foreach { case (_, v) =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < K) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(K) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids.map(_.map(_.toFloat))
  }

  /** Nearest-centroid id for an embedding column, given centroid literals.
    * Squared L2 to centroid c = |v|² - 2·v·c + |c|²; |v|² is constant per
    * row, so argmin over (-2·v·c + |c|²) suffices — one dot product per
    * centroid, all in codegen.
    */
  private def nearestCentroid(centroids: Array[Array[Float]]) = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(v => lit(v)).toSeq: _*).cast("array<float>")
      val c2 = c.map(v => v.toDouble * v).sum
      struct((lit(c2) - lit(2.0) * dotF(col("embedding"), cCol)).as("d"), lit(i).as("c"))
    }
    array_min(array(scored.toSeq: _*)).getField("c")
  }

  private def centroidsFor(spark: SparkSession, dir: String): Array[Array[Float]] = {
    import spark.implicits._
    val sample = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    trainCentroids(sample)
  }

  /** Inverted lists: vec_id → centroid assignment (map-only). */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), nearestCentroid(centroidsFor(spark, dir)).as("centroid"))

  /** IVF top-k: probe the NProbe nearest centroids per query. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val cents = centroidsFor(spark, dir)
    val emb = table(spark, dir, "embeddings")
    val assigned = emb.withColumn("centroid", nearestCentroid(cents))

    // per-query probe set: distances to all K centroids, keep NProbe best
    val probeScored = cents.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(v => lit(v)).toSeq: _*).cast("array<float>")
      val c2 = c.map(v => v.toDouble * v).sum
      struct((lit(c2) - lit(2.0) * dotF(col("embedding"), cCol)).as("d"), lit(i).as("c"))
    }
    val probes = emb.filter(col("vec_id") < NumQueries)
      .select(
        col("vec_id").as("qid"), col("embedding").as("qe"),
        slice(array_sort(array(probeScored.toSeq: _*)), 1, NProbe).as("probe_list"))
      .select(col("qid"), col("qe"), explode(col("probe_list").getField("c")).as("centroid"))

    val cos = cosineF(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid")).orderBy(round(cos, 6).desc, col("vec_id"))
    assigned.join(broadcast(probes), "centroid")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("vec_id"), round(cos, 4).as("cosine"), col("rn").cast("int").as("rn"))
  }
}
