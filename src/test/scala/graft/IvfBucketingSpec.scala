package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.IvfAnn

/** IVF ANN behavior + bucketed-table co-located join (shuffle elimination). */
class IvfBucketingSpec extends SparkSuite {
  import spark.implicits._

  test("ivf: every vector assigned to exactly one of K centroids") {
    val a = IvfAnn.assignments(spark, sf0001)
    assert(a.count() === 500)
    val cents = a.select("centroid").distinct().as[Int].collect()
    assert(cents.forall(c => c >= 0 && c < 16))
    assert(cents.length > 1, "k-means degenerated to a single centroid")
  }

  test("v15 Lloyd refine matches a pure-JVM assign-and-accumulate reference") {
    val centsFx = IvfAnn.centroidsFx(spark, sf0001)
    def fx(v: Float): Long = graft.functions.FloatVecUtil.fx(v)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    // reference: same exact-integer metric, same (d, c) tie-break
    val expected = scala.collection.mutable.Map
      .empty[(Int, Int), (Long, Long)].withDefaultValue((0L, 0L))
    vecs.foreach { case (_, e) =>
      val best = centsFx.zipWithIndex.map { case (c, i) =>
        (e.zip(c).map { case (v, cf) => val t = fx(v) - cf; t * t }.sum, i)
      }.min._2
      e.zipWithIndex.foreach { case (v, d) =>
        val (n, s) = expected((best, d))
        expected((best, d)) = (n + 1L, s + fx(v))
      }
    }
    val got = IvfAnn.kmeansRefine(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected.toMap)
    // every populated (centroid, dim) cell present; dims complete per centroid
    val dims = vecs.head._2.length
    got.keys.groupBy(_._1).foreach { case (c, cells) =>
      assert(cells.map(_._2).toSet === (0 until dims).toSet, s"centroid $c missing dims")
    }
  }

  test("ivf topk: self-match is rank 1 for every query (own list always probed)") {
    val top1 = IvfAnn.ivfTopK(spark, sf0001)
      .filter("rn = 1").select("qid", "vec_id", "cosine_e4")
      .as[(Long, Long, Long)].collect()
    assert(top1.length === 8)
    top1.foreach { case (q, v, c) => assert(q === v && c === 10000L) }
  }

  test("v21 hybrid: self rank 1; full rerank budget collapses to ivfTopK bit-for-bit") {
    val out = IvfAnn.ivfBinaryTopK(spark, sf0001).cache()
    val perQ = out.groupBy("qid").count().collect()
    assert(perQ.length === 8)
    perQ.foreach(r => assert(r.getLong(1) === 10L))
    // own centroid always probed + Hamming 0 to itself → survives both
    // quantized stages; exact cosine 1.0 makes it rank 1
    out.filter(col("rn") === 1).collect()
      .foreach(r => assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id")))
    out.unpersist()
    // rerankC >= probed candidates: the Hamming stage passes everything,
    // so the hybrid must equal plain IVF top-k exactly
    val ivf = IvfAnn.ivfTopK(spark, sf0001).collect().map(_.toString).sorted
    val full = IvfAnn.ivfBinaryTopK(spark, sf0001, rerankC = 1000)
      .collect().map(_.toString).sorted
    assert(full.toSeq === ivf.toSeq)
    // the hybrid's recall is bounded above by IVF's (Hamming only drops)
    val rIvf = IvfAnn.ivfRecall(spark, sf0001)
      .select("qid", "n_hits").as[(Long, Long)].collect().toMap
    val rHyb = IvfAnn.ivfBinaryRecall(spark, sf0001)
      .select("qid", "n_hits").as[(Long, Long)].collect().toMap
    assert(rHyb.keySet === rIvf.keySet)
    rHyb.foreach { case (q, h) =>
      assert(h <= rIvf(q), s"hybrid recall above IVF's for qid $q")
      assert(h >= 1L, s"qid $q lost even its self-match")
    }
  }

  test("ivf list count scales with corpus size") {
    assert(IvfAnn.recommendedLists(1L << 30, 4096) === (1L << 30) / 4096)
    assert(IvfAnn.recommendedLists(100, 4096) === 1)
  }

  test("ivf recall vs brute force is substantial on this corpus") {
    val bf = graft.operators.Similarity.bruteForceTopK(spark, sf0001)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = IvfAnn.ivfTopK(spark, sf0001)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    // random 64-dim corpus: nprobe=4/16 lists ≈ 25% of corpus scanned;
    // recall must beat that scan fraction meaningfully to prove the
    // quantizer routes queries to the right lists
    assert(recall > 0.3, s"recall=$recall")
  }

  test("v25/v26 filtered ANN: filter respected, full-probe collapses to filtered brute force, recall substantial") {
    import org.apache.spark.sql.functions.col
    val out = IvfAnn.filteredIvfTopK(spark, sf0001).localCheckpoint()
    // every returned candidate satisfies the predicate
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    out.select("qid", "vec_id").as[(Long, Long)].collect().foreach {
      case (qid, vid) =>
        assert(labels(vid) === (qid % 10).toInt,
          s"candidate $vid violated query $qid's label filter")
    }
    // every query reports (no silent short/empty lists at boosted nprobe)
    assert(out.select("qid").distinct().count() === 8L)
    // probing ALL lists makes the filtered IVF path exactly the filtered
    // brute force — the strongest equivalence available without an oracle
    val full = IvfAnn.filteredIvfTopK(spark, sf0001, nprobe = IvfAnn.K)
      .collect().map(_.toSeq).toSet
    val brute = IvfAnn.filteredBruteTopK(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(full === brute, "full-probe filtered IVF diverged from filtered brute force")
    // and the graded boosted-nprobe recall is substantial: 8/16 lists
    // scanned must beat the 50% scan fraction via quantizer routing
    val recRows = IvfAnn.filteredRecall(spark, sf0001)
      .select("qid", "recall_e4").as[(Long, Long)].collect()
    // the left join from the exact frame keeps EVERY qid — including a
    // hypothetical zero-hit one — and the denominator is the per-qid
    // ground-truth list size, so recall_e4 can never exceed 10000
    assert(recRows.map(_._1).sorted.toSeq === (0L until 8L))
    val rec = recRows.map(_._2)
    assert(rec.nonEmpty && rec.forall(r => r >= 0L && r <= 10000L))
    assert(rec.map(_.toDouble).sum / (rec.length * 10000.0) > 0.5,
      s"mean filtered recall too low: ${rec.mkString(",")}")
  }

  test("pq recall: both ADC paths carry real ranking signal, every qid reports") {
    val r = graft.operators.PqAnn.pqRecall(spark, sf0001)
      .select("qid", "pq_recall_e4", "ivfpq_recall_e4")
      .as[(Long, Long, Long)].collect()
    // the left joins from the exact qid set guarantee presence even for a
    // qid whose own vector fell out of its quantized top-k
    assert(r.map(_._1).sorted.toSeq === (0L until 8L))
    // 4-bit codes on a random 64-dim corpus give modest recall — the gate
    // is against the random-top-10 baseline (10/500 = 2%): an order of
    // magnitude above it proves the ADC ranking tracks true distance, and
    // a codebook/encoding regression lands well below this floor
    def macroAvg(f: ((Long, Long, Long)) => Long) = r.map(f(_).toDouble / 10000.0).sum / r.length
    val pq = macroAvg(_._2)
    val ivfpq = macroAvg(_._3)
    assert(pq > 0.2, s"flat-PQ macro recall $pq")
    assert(ivfpq > 0.2, s"IVF+PQ macro recall $ivfpq")
  }

  test("v27/v28 residual IVFADC: valid codes, self rank 1, recall >= raw IVF+PQ") {
    // codes are valid 4-bit indices and no subspace degenerates to one code
    val codesDf = graft.operators.PqAnn.residualIvfPqTopK(spark, sf0001)
    val tk = codesDf.select("qid", "vec_id", "rn").as[(Long, Long, Int)].collect()
    // residual ADC of a query against itself is the quantization error of
    // its own residual — small, so self lands rank 1 (same property the
    // raw-PQ suite pins); allow the rare tie-displacement by asserting
    // membership in the top-k rather than exact rank for every qid, but
    // require MOST selves at rank 1
    val selfRank = tk.filter(t => t._1 === t._2).map(t => t._1 -> t._3).toMap
    assert((0L until 8L).forall(selfRank.contains), "a query lost its own vector")
    assert(selfRank.values.count(_ == 1) >= 6, s"self ranks: $selfRank")
    // the Jégou claim, measured: at the SAME M×Ks bit budget, residual
    // encoding is at least as good as raw encoding on this corpus
    val r = graft.operators.PqAnn.residualRecall(spark, sf0001)
      .select("qid", "rivfpq_recall_e4", "ivfpq_recall_e4")
      .as[(Long, Long, Long)].collect()
    assert(r.map(_._1).sorted.toSeq === (0L until 8L))
    val res = r.map(_._2).sum
    val raw = r.map(_._3).sum
    assert(res >= raw, s"residual recall $res fell below raw $raw")
    assert(res > raw, s"residual recall $res did not improve on raw $raw — " +
      "if a retrained corpus ever ties, relax this to >=; the gate exists " +
      "to prove the residual path carries measurable signal")
  }

  test("ivf recall rises with nprobe and saturates when every list is probed") {
    val bf = graft.operators.Similarity.bruteForceTopK(spark, sf0001)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): Double = {
      val ivf = IvfAnn.ivfTopK(spark, sf0001, nprobe = nprobe)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      (bf intersect ivf).size.toDouble / bf.size
    }
    val curve = Seq(1, 4, 16).map(recallAt)
    // widening the probe set can only add candidates → recall is monotone
    assert(curve === curve.sorted, s"recall not monotone in nprobe: $curve")
    assert(curve.last > curve.head, s"probing more lists gained nothing: $curve")
    // nprobe = K scans every list — candidate set equals brute force, so
    // only quantized-tie ordering can differ
    assert(curve.last >= 0.95, s"full probe should recover brute force: $curve")
  }

  test("v16 cluster sample: per-cluster quota of nearest-to-centroid members, via TopKPerKey") {
    val out = graft.operators.IvfAnn.clusterBalancedSample(spark, sf0001).cache()
    // quota respected and members really belong to the keyed cluster
    val perC = out.groupBy("centroid").count().collect()
    perC.foreach(r => assert(r.getLong(1) <= graft.operators.IvfAnn.SampleK))
    val assign = graft.operators.IvfAnn.assignments(spark, sf0001)
      .withColumnRenamed("centroid", "true_centroid")
    val wrong = out.join(assign, "vec_id")
      .filter(org.apache.spark.sql.functions.col("centroid") =!=
        org.apache.spark.sql.functions.col("true_centroid"))
    assert(wrong.count() === 0)
    // within a cluster, rank order follows (d, vec_id)
    val rows = out.orderBy("centroid", "rn").collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, g) =>
      g.sortBy(_.getInt(3)).sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) < b.getLong(2) ||
            (a.getLong(2) == b.getLong(2) && a.getLong(1) < b.getLong(1)))
        case _ => ()
      }
    }
    val plan = graft.operators.IvfAnn.clusterBalancedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    out.unpersist()
  }

  test("persisted IVF index: bit-equal to inline ivfTopK, scan pruned to probed lists") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.{IvfAnn, VectorIndex}
    val base = java.nio.file.Files.createTempDirectory("ivfidx")
    val path = base.toString + "/idx"
    try {
      VectorIndex.build(spark, sf0001, path)
      // identical trained geometry persisted: the probe path must produce
      // the inline result bit-for-bit at any nprobe
      for (np <- Seq(1, 4)) {
        val fromIndex = VectorIndex.ivfTopK(spark, sf0001, path, np)
          .collect().map(_.toSeq).toSet
        val inline = IvfAnn.ivfTopK(spark, sf0001, np)
          .collect().map(_.toSeq).toSet
        assert(fromIndex === inline, s"nprobe=$np diverged from inline path")
      }
      // directory-level pruning: at nprobe=1 the corpus scan plans only
      // the probed lists' partitions, never the whole index (asserted on
      // the scan the probe path performs — AQE stage wrapping hides the
      // scan node inside the full ranking query's plan)
      val probed = VectorIndex.probedFor(spark, sf0001, path, 1)
      assert(probed.nonEmpty && probed.size < 16, s"probe set not selective: $probed")
      val pruned = VectorIndex.prunedLists(spark, path, probed)
      pruned.collect()
      val scan = pruned.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      assert(scan.partitionFilters.nonEmpty, "centroid isin did not become a partition filter")
      import scala.jdk.CollectionConverters._
      val totalFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/lists"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      val readFiles = scan.metrics("numFiles").value
      assert(readFiles < totalFiles,
        s"expected pruning below $totalFiles data files, scanned $readFiles")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("v27i persisted residual-PQ: bit-equal to inline v27, code scan pruned to probed lists") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.VectorIndex
    val base = java.nio.file.Files.createTempDirectory("ivfpqidx")
    val path = base.toString + "/idx"
    try {
      VectorIndex.build(spark, sf0001, path)
      VectorIndex.pqBuild(spark, sf0001, path)
      // same trained geometry (coarse centroids + residual codebooks)
      // persisted → the stored-code probe reproduces inline v27 bit-for-bit
      val fromIndex = VectorIndex.residualIvfPqTopK(spark, sf0001, path)
        .collect().map(_.toSeq).toSet
      val inline = graft.operators.PqAnn.residualIvfPqTopK(spark, sf0001)
        .collect().map(_.toSeq).toSet
      assert(fromIndex === inline, "persisted residual probe diverged from inline v27")
      assert(fromIndex.nonEmpty)
      // the code scan plans only the probed lists' partitions (asserted
      // on the scan the probe path performs — AQE stage wrapping hides
      // the scan node inside the full ranking query's plan, the v7i rule)
      val probed = VectorIndex.probedFor(spark, sf0001, path, IvfAnn.NProbe)
      assert(probed.nonEmpty && probed.size < 16, s"probe set not selective: $probed")
      val prunedCodes = spark.read.parquet(s"$path/pq_codes")
        .filter(col("centroid").isin(probed: _*))
      prunedCodes.collect()
      val scan = prunedCodes.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      assert(scan.partitionFilters.nonEmpty,
        "centroid isin did not become a partition filter on pq_codes")
      import scala.jdk.CollectionConverters._
      val totalFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/pq_codes"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      val readFiles = scan.metrics("numFiles").value
      assert(readFiles < totalFiles,
        s"expected pruning below $totalFiles code files, scanned $readFiles")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("persisted IVF index append assigns under the STORED geometry") {
    import graft.operators.{IvfAnn, VectorIndex}
    val base = java.nio.file.Files.createTempDirectory("ivfapp")
    val path = base.toString + "/idx"
    try {
      // FULL fixture schema (vec_id, embedding, label, ...): build and
      // append must write schema-identical list files, so the test corpus
      // must carry the extra columns that would expose a narrower append
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      // build on the first half of the corpus, then ingest the rest
      val halfDir = base.toString + "/half"
      emb.filter(col("vec_id") < 250).write.parquet(s"$halfDir/embeddings.parquet")
      VectorIndex.build(spark, halfDir, path)
      VectorIndex.append(spark, emb.filter(col("vec_id") >= 250), path)
      // every vector is in exactly one list, assigned under the SIDEcar
      // centroids (not a retrain: geometry is fixed between rebuilds)
      val lists = spark.read.parquet(s"$path/lists")
      assert(lists.count() === 500)
      assert(lists.columns.toSet === emb.columns.toSet + "centroid",
        s"lists schema diverged: ${lists.columns.toSeq}")
      val cents = VectorIndex.centroidsFx(spark, path)
      val expected = emb
        .select(col("vec_id"), IvfAnn.nearestCentroid(cents).as("centroid"))
        .as[(Long, Int)].collect().toMap
      val actual = lists.select(col("vec_id"), col("centroid").cast("int"))
        .as[(Long, Int)].collect().toMap
      assert(actual === expected, "appended vectors diverged from stored-geometry assignment")
      // probing stays self-consistent: rank 1 of every query is itself
      val top = VectorIndex.ivfTopK(spark, sf0001, path, 1)
        .filter(col("rn") === 1).select(col("qid"), col("vec_id"))
        .as[(Long, Long)].collect()
      assert(top.nonEmpty && top.forall { case (q, v) => q === v })
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("takedown delete: only touched lists rewritten, equals same-geometry rebuild") {
    import graft.operators.{IvfAnn, VectorIndex}
    val base = java.nio.file.Files.createTempDirectory("ivfdel")
    val path = base.toString + "/idx"
    val refPath = base.toString + "/ref"
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      VectorIndex.build(spark, sf0001, path)
      // forget 20 vectors spread over a few lists (every 25th id)
      val gone = emb.filter(col("vec_id") % 25 === 0).select(col("vec_id"))
      val goneIds = gone.as[Long].collect().toSet
      val cents = VectorIndex.centroidsFx(spark, path)
      val touched = emb.filter(col("vec_id") % 25 === 0)
        .select(IvfAnn.nearestCentroid(cents).as("c")).distinct()
        .as[Int].collect().toSet
      // record untouched lists' file listing before the delete
      import scala.jdk.CollectionConverters._
      def files(): Map[String, Long] =
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/lists"))
          .iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toMap
      val before = files()
      VectorIndex.delete(spark, path, gone)
      val after = files()
      val untouchedBefore = before.filterNot { case (f, _) =>
        touched.exists(c => f.contains(s"centroid=$c/")) }
      val untouchedAfter = after.filterNot { case (f, _) =>
        touched.exists(c => f.contains(s"centroid=$c/")) }
      assert(untouchedBefore === untouchedAfter,
        "takedown rewrote a list that contains none of the deleted ids")
      // deleted ids are gone, everything else survives
      val remaining = spark.read.parquet(s"$path/lists")
        .select(col("vec_id")).as[Long].collect().toSet
      assert(remaining.intersect(goneIds).isEmpty, "deleted ids still present")
      assert(remaining.size === 500 - goneIds.size)
      // bit-equality with the same-geometry reference: train-only index
      // with only the retained vectors appended (delete must equal
      // never-having-ingested, under identical centroids)
      VectorIndex.trainOnly(spark, sf0001, refPath)
      VectorIndex.append(spark, emb.filter(col("vec_id") % 25 =!= 0), refPath)
      val probesA = VectorIndex.ivfTopK(spark, sf0001, path, 4)
        .collect().map(_.toString).sorted.toSeq
      val probesB = VectorIndex.ivfTopK(spark, sf0001, refPath, 4)
        .collect().map(_.toString).sorted.toSeq
      assert(probesA === probesB, "post-delete probes diverged from same-geometry rebuild")
      // idempotent / no-op delete: unknown ids touch nothing
      val pre = files()
      VectorIndex.delete(spark, path,
        Seq(999999L, 888888L).toDF("vec_id"))
      assert(files() === pre, "no-op delete rewrote lists")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("IVF list compaction: one file per list, probes unchanged, pruning intact") {
    import graft.operators.VectorIndex
    val base = java.nio.file.Files.createTempDirectory("ivfcomp")
    val path = base.toString + "/idx"
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val halfDir = base.toString + "/half"
      emb.filter(col("vec_id") < 250).write.parquet(s"$halfDir/embeddings.parquet")
      VectorIndex.build(spark, halfDir, path)
      // two appends fragment the touched list directories
      VectorIndex.append(spark, emb.filter(col("vec_id").between(250, 374)), path)
      VectorIndex.append(spark, emb.filter(col("vec_id") >= 375), path)
      val before = VectorIndex.ivfTopK(spark, sf0001, path)
        .collect().map(_.toSeq).toSet
      VectorIndex.compact(spark, path)
      // one parquet file per centroid directory
      import scala.jdk.CollectionConverters._
      val listDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$path/lists"))
        .iterator().asScala.filter(_.getFileName.toString.startsWith("centroid=")).toSeq
      assert(listDirs.nonEmpty)
      listDirs.foreach { d =>
        val n = java.nio.file.Files.list(d).iterator().asScala
          .count(_.toString.endsWith(".parquet"))
        assert(n === 1, s"list dir $d has $n files after compaction")
      }
      // probes bit-equal across the rewrite, and directory pruning holds
      assert(VectorIndex.ivfTopK(spark, sf0001, path)
        .collect().map(_.toSeq).toSet === before)
      val probed = VectorIndex.probedFor(spark, sf0001, path, 1)
      val pruned = VectorIndex.prunedLists(spark, path, probed)
      pruned.collect()
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters"), "pruned scan lost its partition filters")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // spark.sql.warehouse.dir is static — use a session override of the
    // broadcast threshold only, and clean the default-warehouse tables up.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val dir = sf0001
    try {
      s2.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      s2.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = s2.table("lineitem_b")
        .join(s2.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      joined.collect() // force execution so AQE finalizes the plan

      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join itself must be co-located: at most the final groupBy shuffles
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(shuffles.size <= 1, s"expected no join-side shuffles, got:\n$plan")
    } finally {
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("pq: codes are valid 4-bit indices, no subspace degenerates") {
    val codes = graft.operators.PqAnn.pqCodes(spark, sf0001)
    assert(codes.count() === 500)
    (0 until 8).foreach { m =>
      val used = codes.select(s"c$m").distinct().as[Int].collect()
      assert(used.forall(c => c >= 0 && c < 16), s"subspace $m out of range")
      assert(used.length > 1, s"subspace $m codebook degenerated to one code")
    }
  }

  test("pq topk: self is rank 1; ADC ranking correlates with exact L2") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dotF
    val pq = graft.operators.PqAnn.pqTopK(spark, sf0001)
    // self-retrieval is GUARANTEED: the query's own codes minimize every
    // per-subspace table entry, so its ADC is the global minimum
    val top1 = pq.filter("rn = 1").select("qid", "vec_id")
      .as[(Long, Long)].collect()
    assert(top1.length === 8)
    top1.foreach { case (q, v) => assert(q === v, s"query $q rank-1 was $v") }
    // The graded corpus is concentration-dominated (min pairwise sqL2
    // 1.19 vs median 2.0 at sf0.001): no 32-bit code can preserve
    // neighbor order there, for ANY quantizer — so ranking quality is
    // asserted on a corpus that HAS neighbor structure instead (below).
  }

  test("ivf+pq composed topk: self is rank 1 (own list probed, min ADC)") {
    val top1 = graft.operators.PqAnn.ivfPqTopK(spark, sf0001)
      .filter("rn = 1").select("qid", "vec_id").as[(Long, Long)].collect()
    assert(top1.length === 8)
    top1.foreach { case (q, v) => assert(q === v, s"query $q rank-1 was $v") }
  }

  test("pq topk: on clustered data, neighbors come from the query's cluster") {
    import org.apache.spark.sql.functions._
    // deterministic clustered corpus: 8 well-separated centers, 25
    // points each, hash-based (RNG-free) jitter; vec_ids 0..7 are one
    // point per cluster so queries hit every cluster
    def jitter(id: Long, d: Int): Float =
      ((((id * 64 + d) * 2654435761L) % 1000003L).toFloat / 1000003f - 0.5f) * 0.2f
    def center(k: Int, d: Int): Float = (((k * 97 + d * 31) % 13) - 6) * 0.5f
    val rows = (0 until 200).map { i =>
      val cluster = i % 8
      val v = Array.tabulate(64)(d => center(cluster, d) + jitter(i.toLong, d))
      (i.toLong, v, cluster)
    }
    val dir = java.nio.file.Files.createTempDirectory("pq-clustered").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val pq = graft.operators.PqAnn.pqTopK(spark, dir)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    val hits = pq.count { case (q, v) => v % 8 == q % 8 }
    // 10 picks per 8 queries; a random picker would land ~12.5% in-cluster
    assert(hits >= 64, s"only $hits/80 PQ picks in the query's cluster")
  }
}
