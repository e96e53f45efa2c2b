package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Similarity}

/** Dedup + ANN behavior on the real testdata plus planted duplicates. */
class DedupSimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup keeps one survivor per distinct text") {
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val distinctTexts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").distinct().count()
    val kept = Dedup.exactDedupKeep(spark, sf0001).count()
    assert(kept === distinctTexts)
    assert(kept <= total)
  }

  test("clone planting is off by default — no fabricated ids leak out") {
    // d1/d2: the raw corpus has no byte-identical texts, so the default
    // (production) path finds no duplicate groups and keeps every doc
    assert(Dedup.exactDuplicateGroups(spark, sf0001).count() === 0L)
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(Dedup.exactDedupKeep(spark, sf0001).count() === total)
    // v5: no planted clones → no vec_id beyond the real corpus range
    val fabricated = Similarity.embeddingNearDuplicates(spark, sf0001)
      .filter($"a" >= 1000000L || $"b" >= 1000000L).count()
    assert(fabricated === 0L)
  }

  test("cross-corpus fuzzy join surfaces every planted eval near-copy") {
    val planted = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"doc_id" % 100 === 50).select("doc_id").as[Long].collect().toSet
    assert(planted.nonEmpty)
    val pairs = Dedup.crossCorpusFuzzyPairs(spark, sf0001, plantClones = true)
      .as[(Long, Long, Long)].collect()
    // each planted clone (train_id + 1e6) must pair with its source at
    // near-1.0 jaccard (one token dropped from a long doc)
    planted.foreach { t =>
      val hit = pairs.find(p => p._1 == t + 1000000L && p._2 == t)
      assert(hit.isDefined, s"planted pair for train doc $t not found")
      assert(hit.get._3 > 9000L, s"jaccard too low: ${hit.get._3}")
    }
    // planting off → no fabricated eval ids
    assert(Dedup.crossCorpusFuzzyPairs(spark, sf0001)
      .filter($"eval_id" >= 1000000L).count() === 0L)
  }

  test("jaccard of identical shingle sets is 1.0 (planted duplicate)") {
    // plant a duplicate by writing a tiny corpus
    val dir = java.nio.file.Files.createTempDirectory("dupes").toString
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, text, "en", "s", text.length.toLong),
      (2L, text, "en", "s", text.length.toLong),
      (3L, other, "en", "s", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val jac = Dedup.ngramJaccardPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(jac === Set((1L, 2L, 10000L)))

    val mh = Dedup.minhashLshPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(mh === Set((1L, 2L, 10000L)))

    val sp = Dedup.simhashPairs(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(sp === Set((1L, 2L)))
  }

  test("duplicate clusters merge transitively (a~b~c one cluster, a!~c)") {
    val dir = java.nio.file.Files.createTempDirectory("chain").toString
    val base = (1 to 40).map(i => s"w$i")
    val b = base.updated(5, "X1").updated(15, "X2").updated(25, "X3")
    val c = b.updated(8, "Y1").updated(18, "Y2").updated(28, "Y3")
    val far = (100 to 140).map(i => s"z$i")
    def doc(id: Long, toks: Seq[String]) = {
      val t = toks.mkString(" ")
      (id, t, "en", "s", t.length.toLong)
    }
    Seq(doc(1, base), doc(2, b), doc(3, c), doc(4, far))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Dedup.ngramJaccardPairs(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L)), "1~3 should be below threshold (chain test invalid)")

    val clusters = Dedup.duplicateClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L && clusters(3L) === 1L)
    assert(!clusters.contains(4L), "isolated docs have no cluster row")
  }

  test("minhash LSH candidates reproduce full jaccard pairs on sf0.001") {
    val exact = Dedup.ngramJaccardPairs(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    // LSH candidates are a subset-with-high-recall of the exact pairs;
    // everything LSH verifies must appear in the exact set.
    assert(lsh.subsetOf(exact))
    // recall on this corpus (pairs here are mostly exact dups, sim=1) is total
    assert(lsh === exact)
  }

  test("brute-force topk: every query's rank-1 neighbor is itself") {
    val top = Similarity.bruteForceTopK(spark, sf0001)
      .filter("rn = 1")
      .select("qid", "vec_id", "cosine_e4")
      .as[(Long, Long, Long)].collect()
    assert(top.length === 8)
    top.foreach { case (q, v, c) => assert(q === v && c === 10000L) }
  }

  test("adaptive two-stage topk: self rank 1, k rows per query, results from the coarse candidates") {
    import org.apache.spark.sql.functions.{broadcast, col, slice}
    val out = graft.operators.Similarity.adaptiveTopK(spark, sf0001).cache()
    val perQ = out.groupBy("qid").count().collect()
    assert(perQ.length === 8)
    perQ.foreach(r => assert(r.getLong(1) === 10L))
    // the query's own vector has prefix cosine 1.0, survives the coarse
    // stage, and full cosine 1.0 makes it rank 1
    out.filter(col("rn") === 1).collect()
      .foreach(r => assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id")))
    // every returned pair came through the prefix-dim candidate stage
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val coarse = emb.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        graft.operators.Exact.e(graft.functions.VectorFunctions.cosFxF(
          slice(col("qe"), 1, 16), slice(col("embedding"), 1, 16)), 6).as("p6"))
    val cand = graft.plans.TopKPerKey(
        coarse, Seq(col("qid")), Seq(col("p6").desc, col("vec_id")), 50)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.select(col("qid"), col("vec_id")).collect()
      .foreach(r => assert(cand.contains((r.getLong(0), r.getLong(1)))))
    out.unpersist()
  }

  test("adaptive retrieval recall rises with the candidate budget, exact at full corpus") {
    val exact = graft.operators.Similarity.bruteForceTopK(spark, sf0001)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(c: Int): Double = {
      val got = graft.operators.Similarity.adaptiveTopK(spark, sf0001, refineC = c)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val r10 = recallAt(10)
    val r50 = recallAt(50)
    val rAll = recallAt(1000) // budget >= corpus: stage 2 sees everything
    assert(r10 <= r50 && r50 <= rAll, s"recall not monotone: $r10, $r50, $rAll")
    assert(rAll === 1.0, s"full-budget adaptive pass must equal brute force, got $rAll")
  }

  test("binary sign-bit topk: self rank 1, k rows per query, full budget equals brute force") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Similarity.binaryTopK(spark, sf0001).cache()
    val perQ = out.groupBy("qid").count().collect()
    assert(perQ.length === 8)
    perQ.foreach(r => assert(r.getLong(1) === 10L))
    // identical vectors have Hamming 0 → the query always survives the
    // coarse stage, and full cosine 1.0 makes it rank 1
    out.filter(col("rn") === 1).collect()
      .foreach(r => assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id")))
    out.unpersist()
    // rerank budget >= corpus: the exact stage sees everything, so the
    // 1-bit path must reproduce brute force bit for bit
    val exact = graft.operators.Similarity.bruteForceTopK(spark, sf0001)
      .collect().map(_.toString).sorted
    val full = graft.operators.Similarity.binaryTopK(spark, sf0001, rerankC = 1000)
      .collect().map(_.toString).sorted
    assert(full.toSeq === exact.toSeq)
  }

  test("binary recall: every query reports, above the floor, and beats no-signal") {
    val rec = graft.operators.Similarity.binaryRecall(spark, sf0001)
      .select("qid", "n_hits").as[(Long, Long)].collect().toMap
    assert(rec.keySet === (0L until 8L).toSet)
    // sign bits of a 64-dim vector carry real angle signal: measured 5-8
    // of 10 per query at sf0.001; 3 is the regression floor (random-50-
    // of-500 candidates would land ~1)
    rec.foreach { case (q, h) => assert(h >= 3L, s"qid $q recall collapsed: $h/10") }
  }

  test("int8 topk: self rank 1, full budget equals brute force, recall dominates 1-bit") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Similarity.int8TopK(spark, sf0001).cache()
    val perQ = out.groupBy("qid").count().collect()
    assert(perQ.length === 8)
    perQ.foreach(r => assert(r.getLong(1) === 10L))
    // a vector's own codes maximize code-space cosine → the query
    // survives the coarse stage and exact cosine 1.0 makes it rank 1
    out.filter(col("rn") === 1).collect()
      .foreach(r => assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id")))
    out.unpersist()
    // rerank budget >= corpus: exact stage sees everything → brute force
    val exact = graft.operators.Similarity.bruteForceTopK(spark, sf0001)
      .collect().map(_.toString).sorted
    val full = graft.operators.Similarity.int8TopK(spark, sf0001, rerankC = 1000)
      .collect().map(_.toString).sorted
    assert(full.toSeq === exact.toSeq)
    // the ladder's accuracy ordering: 8-bit magnitudes must recall at
    // least as much as 1-bit signs, per query, at the same budget
    val i8 = graft.operators.Similarity.int8Recall(spark, sf0001)
      .select("qid", "n_hits").as[(Long, Long)].collect().toMap
    val b1 = graft.operators.Similarity.binaryRecall(spark, sf0001)
      .select("qid", "n_hits").as[(Long, Long)].collect().toMap
    assert(i8.keySet === (0L until 8L).toSet)
    val (si8, sb1) = (i8.values.sum, b1.values.sum)
    assert(si8 >= sb1, s"int8 total recall $si8 fell below 1-bit $sb1")
    i8.foreach { case (q, h) => assert(h >= 5L, s"qid $q int8 recall collapsed: $h/10") }
  }

  test("lsh ann results are a subset of brute-force rankings' universe") {
    val bf = Similarity.bruteForceTopK(spark, sf0001)
      .select("qid").distinct().as[Long].collect().toSet
    val ann = Similarity.lshAnnTopK(spark, sf0001)
      .select("qid").distinct().as[Long].collect().toSet
    assert(ann.subsetOf(bf))
    // self-match always shares the bucket → rank-1 present for every query
    val self = Similarity.lshAnnTopK(spark, sf0001)
      .filter("rn = 1").select("qid", "vec_id").as[(Long, Long)].collect()
    self.foreach { case (q, v) => assert(q === v) }
  }

  test("lsh plane count scales with corpus size (bucket occupancy shrinks)") {
    // the 100 TB knob: planes = ⌈log₂(n / targetBucket)⌉
    assert(Similarity.recommendedPlanes(1L << 30, 256) === 22)
    assert(Similarity.recommendedPlanes(5000, 256) === 5)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def maxBucket(planes: Int) = Similarity.withBucket(emb, planes)
      .groupBy("bucket").count()
      .agg(org.apache.spark.sql.functions.max("count")).as[Long].head()
    assert(maxBucket(10) < maxBucket(6))
  }

  test("lsh buckets are deterministic across runs") {
    val a = Similarity.lshBuckets(spark, sf0001)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Similarity.lshBuckets(spark, sf0001)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("segment dedup flags every planted partial copy at fraction 1.0") {
    val rows = Dedup.duplicatedSegments(spark, sf0001, plantCopies = true)
      .as[(Long, Long, Long, Long)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    // each planted copy is 24 tokens = exactly one 16-token segment, and
    // that segment is the source doc's first segment → fraction 1.0
    (0L until Dedup.PartialCopyCount).foreach { src =>
      val copy = byId(src + Dedup.PartialCopyOffset)
      assert(copy._2 === 1L && copy._3 === 1L && copy._4 === 10000L)
      // the source doc is flagged too (its first segment is the copy);
      // short docs may have ONLY that segment, so the fraction can be 1.0
      val s = byId(src)
      assert(s._3 >= 1L && s._4 <= 10000L)
    }
    // planting off → no fabricated ids leak into the production path
    // (the corpus DOES carry some natural 16-token cross-doc repeats, so
    // n_dup_segments > 0 rows are expected and correct here)
    val raw = Dedup.duplicatedSegments(spark, sf0001)
    assert(raw.filter($"doc_id" >= Dedup.PartialCopyOffset).count() === 0L)
  }

  test("containment surfaces the quoted-prefix pairs symmetric jaccard misses") {
    val cont = Dedup.containmentPairs(spark, sf0001, plantCopies = true)
      .as[(Long, Long, Long, Long)].collect()
    (0L until Dedup.PartialCopyCount).foreach { src =>
      val hit = cont.find(p => p._1 == src && p._2 == src + Dedup.PartialCopyOffset)
      assert(hit.isDefined, s"planted containment pair for doc $src not found")
      assert(hit.get._4 === 10000L, s"prefix copy must be fully contained: ${hit.get._4}")
    }
    // and symmetric jaccard really does score those pairs lower: compute
    // both measures from the actual shingle sets (clone = first 24 tokens
    // of the source), and check at least one planted pair falls below the
    // d3 threshold while containment stays at 1.0 — the gap d11 exists for
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"doc_id" < Dedup.PartialCopyCount)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def shingleSet(toks: Array[String]): Set[String] =
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val measures = texts.map { case (_, text) =>
      val src = shingleSet(text.split(" "))
      val cl = shingleSet(text.split(" ").take(Dedup.PartialCopyTokens.toInt))
      val common = (src & cl).size.toDouble
      (common / (src.size + cl.size - common), common / math.min(src.size, cl.size))
    }
    assert(measures.forall { case (jac, cont) => cont >= jac })
    assert(measures.exists { case (jac, _) => jac < Dedup.DefaultThreshold },
      "every planted source is short enough that jaccard also catches it — planting lost its point")
  }

  test("semantic dedup drops exactly the planted clones, keeps the corpus") {
    val rows = graft.operators.IvfAnn.semanticDedup(spark, sf0001, plantClones = true)
      .as[(Long, Int, Boolean)].collect()
    val dropped = rows.filter(!_._3).map(_._1).toSet
    // every clone sits in its source's cluster at cosine ≈ 0.996 and has
    // the higher id → all 32 dropped, nothing else is
    assert(dropped === (0L until 32L).map(_ + 1000000L).toSet)
    // planting off → production corpus unmodified and fully kept
    val raw = graft.operators.IvfAnn.semanticDedup(spark, sf0001)
    assert(raw.filter(!$"kept").count() === 0L)
    assert(raw.count() === spark.read.parquet(s"$sf0001/embeddings.parquet").count())
  }

  test("substring spans: overlapping windows merge maximal, intra-doc repeats count") {
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    // doc 1 and 2 share a 40-token prefix (25 overlapping 16-token
    // windows → ONE maximal span of 40); doc 3 repeats its own 16-token
    // prefix after an 8-token gap (intra-doc duplication d10 can't see);
    // doc 4 is all-unique
    val shared = (1 to 40).map(i => s"w$i")
    val d1 = shared ++ (1 to 20).map(i => s"a$i")
    val d2 = shared ++ (1 to 20).map(i => s"b$i")
    val p = (1 to 16).map(i => s"p$i")
    val d3 = p ++ (1 to 8).map(i => s"q$i") ++ p
    val d4 = (1 to 50).map(i => s"u$i")
    def doc(id: Long, toks: Seq[String]) = {
      val t = toks.mkString(" ")
      (id, t, "en", "s", t.length.toLong)
    }
    Seq(doc(1, d1), doc(2, d2), doc(3, d3), doc(4, d4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = Dedup.substringSpans(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // docs 1/2: one merged span covering exactly the 40 shared tokens
    Seq(1L, 2L).foreach { id =>
      val (_, n, spans, dup, frac) = rows(id)
      assert(n === 60L && spans === 1L && dup === 40L)
      assert(frac === 6667L) // floor(40/60*1e4+0.5)
    }
    // doc 3: TWO spans (j=0 and j=24 both duplicated, 8-token gap between)
    val (_, n3, s3, dup3, frac3) = rows(3L)
    assert(n3 === 40L && s3 === 2L && dup3 === 32L && frac3 === 8000L)
    // doc 4: no duplicated window → no row
    assert(!rows.contains(4L))
  }

  test("substring spans flag every planted partial copy in full") {
    val rows = Dedup.substringSpans(spark, sf0001, plantCopies = true)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    (0L until Dedup.PartialCopyCount).foreach { src =>
      // the copy (≤24 tokens — shorter when its source is) is ONE merged
      // span covering the whole doc: fraction exactly 1.0
      val copy = byId(src + Dedup.PartialCopyOffset)
      assert(copy._2 >= 16L && copy._2 <= 24L)
      assert(copy._3 === 1L && copy._4 === copy._2 && copy._5 === 10000L)
      // the source doc carries at least that shared-prefix span
      val s = byId(src)
      assert(s._4 >= copy._2)
    }
    // planting off → no fabricated ids in the production path
    assert(Dedup.substringSpans(spark, sf0001)
      .filter($"doc_id" >= Dedup.PartialCopyOffset).count() === 0L)
  }

  test("d13 stored cluster assignment round-trips bit-equal to inline clustering") {
    import graft.operators.{IndexStore, ShingleIndex, TextAnalysis}
    // the persisted (doc_id, cluster_id) frame IS the clustering output
    val stored = spark.read.parquet(IndexStore.clusterPath(spark, sf0001))
      .as[(Long, Long)].collect().toSet
    val inline = ShingleIndex.duplicateClusters(
        spark, IndexStore.shingleTable(spark, sf0001))
      .as[(Long, Long)].collect().toSet
    assert(stored === inline && stored.nonEmpty)
    // and the graded query (stored path) is bit-equal to the inline
    // composition — the seam ScaleOpsSpec pins for every other *i twin
    val quality = TextAnalysis.qualityScores(spark, sf0001)
      .select($"doc_id", $"quality_e4")
    val graded = SparkEntry.queries("d13_cluster_representatives")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    val composed = Dedup.clusterRepresentativesFrom(
        ShingleIndex.duplicateClusters(
          spark, IndexStore.shingleTable(spark, sf0001)), quality)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(graded === composed && graded.nonEmpty)
  }

  test("cluster representative is the highest-quality member, ties to min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val quality = Seq(
      (1L, 100L), (2L, 500L), (3L, 300L), (10L, 50L), (11L, 50L))
      .toDF("doc_id", "quality_e4")
    val reps = Dedup.clusterRepresentativesFrom(
      Dedup.clustersFromPairs(pairs), quality)
      .as[(Long, Long, Long, Long)].collect().toSet
    // cluster {1,2,3}: doc 2 wins on quality despite NOT being min-id;
    // cluster {10,11}: quality tie → min doc_id
    assert(reps === Set((1L, 2L, 3L, 500L), (10L, 10L, 2L, 50L)))
  }

  test("d14: URL canonicalization applies each C4-style rule exactly") {
    val cases = Seq(
      // scheme + host case + www + fragment
      ("https://WWW.Example.ORG/a#frag", "example.org/a"),
      ("HtTp://Example.org/a", "example.org/a"),
      // trailing slashes (also multiple), bare host
      ("https://example.org/a/b///", "example.org/a/b"),
      ("https://example.org/", "example.org"),
      ("https://example.org", "example.org"),
      // utm params dropped, remaining sorted, empty params dropped
      ("https://example.org/p?utm_source=x&b=2&a=1", "example.org/p?a=1&b=2"),
      ("https://example.org/p?a=1&b=2&utm_campaign=y", "example.org/p?a=1&b=2"),
      ("https://example.org/p?utm_source=x", "example.org/p"),
      ("https://example.org/p?&&a=1", "example.org/p?a=1"),
      // www only strips as a label prefix, not inside the host
      ("https://notwww.example.org/p", "notwww.example.org/p"))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
      .select($"doc_id", Dedup.canonicalUrlCol($"url").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) === want, s"canonical($u)")
    }
    // the two utm variants of the same page collapse to ONE group
    val groups = Dedup.urlDedupOf(
      Seq((1L, cases(5)._1), (2L, cases(6)._1)).toDF("doc_id", "url"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(groups === Set(("example.org/p?a=1&b=2", 1L, 2L, 2L)))
  }

  test("d14: planted corpus collapses mess variants — every group multi-form, keeper is min id") {
    val out = Dedup.urlDedup(spark, sf0001).localCheckpoint()
    // canonical content varies on a 105-key space over 500 docs: every
    // group must have collapsed >1 raw form, and totals must cover the
    // corpus exactly once
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.agg(org.apache.spark.sql.functions.sum($"n_docs"))
      .head().getLong(0) === nDocs)
    assert(out.filter($"n_raw_forms" <= 1).count() === 0,
      "a group saw only one raw form — the planted mess is vacuous")
    assert(out.filter($"n_raw_forms" > $"n_docs").count() === 0)
    // keeper really is the group min: recompute per-doc canonicals
    val perDoc = Dedup.plantedCrawlUrls(
        spark.read.parquet(s"$sf0001/documents.parquet"))
      .select($"doc_id", Dedup.canonicalUrlCol($"url").as("canon_url"))
      .groupBy($"canon_url").agg(org.apache.spark.sql.functions.min($"doc_id").as("m"))
    val joined = out.join(perDoc, Seq("canon_url"))
      .filter($"keeper_doc_id" =!= $"m").count()
    assert(joined === 0)
  }

  test("property: canonicalUrlCol equals a pure-JVM reference on randomized messy URLs") {
    // the JVM model of the d14 rules — independent string ops, no shared
    // regex with the Column implementation
    def canonRef(u: String): String = {
      val noFrag = u.split("#", 2)(0)
      val sl = noFrag.replaceFirst("^[a-zA-Z]+://", "")
      val m = java.util.regex.Pattern.compile("^([^/?]+)").matcher(sl)
      val hostRaw = if (m.find()) m.group(1) else ""
      val host = hostRaw.toLowerCase.replaceFirst("^www\\.", "")
      val rest = sl.substring(hostRaw.length)
      val path = rest.split("\\?", 2)(0).replaceFirst("/+$", "")
      val q = if (rest.contains("?")) rest.split("\\?", 2)(1) else ""
      val ps = q.split("&", -1).filter(p => p.nonEmpty && !p.startsWith("utm_")).sorted
      host + path + (if (ps.nonEmpty) "?" + ps.mkString("&") else "")
    }
    val label = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val urlGen = for {
      scheme <- Gen.oneOf("", "http://", "https://", "HTTP://", "HtTpS://")
      www <- Gen.oneOf("", "www.", "WWW.", "wWw.")
      hostLabels <- Gen.chooseNum(1, 3).flatMap(Gen.listOfN(_, label))
      nSegs <- Gen.chooseNum(0, 3)
      segs <- Gen.listOfN(nSegs, label)
      trail <- Gen.oneOf("", "/", "//", "///")
      nPs <- Gen.chooseNum(0, 4)
      ps <- Gen.listOfN(nPs, for {
        k <- Gen.oneOf("a", "b", "ref", "z9", "utm_source", "utm_x", "")
        v <- Gen.oneOf("", "1", "feed", "xY3")
      } yield if (k.isEmpty) "" else s"$k=$v")
      frag <- Gen.oneOf("", "#top", "#s1")
    } yield scheme + www + hostLabels.mkString(".") + segs.map("/" + _).mkString +
      trail + (if (ps.nonEmpty) "?" + ps.mkString("&") else "") + frag
    val urls = (0 until 300)
      .flatMap(i => urlGen.apply(Gen.Parameters.default, Seed(42L + i)))
      .distinct
    val got = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
      .select($"url", Dedup.canonicalUrlCol($"url").as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach(u => assert(got(u) === canonRef(u), s"canonical($u)"))
  }

  test("d15: exact 13-gram decontamination equals a pure-JVM replay; planted sources flagged") {
    import org.apache.spark.sql.functions.col
    val flagged = Dedup.ngramDecontamination(spark, sf0001, plantClones = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: replay the whole fixture on the driver
    // (500-doc corpus) — planted eval clones drop the first word
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val planted = raw.collect { case (id, toks) if id % 100 == 50 =>
      (id + 1000000L) -> toks.drop(1)
    }
    val all = raw ++ planted
    def grams(toks: Seq[String]): Set[Seq[String]] =
      if (toks.length < 13) Set.empty else toks.sliding(13).map(_.toSeq).toSet
    val isEval = (id: Long) => id < 50L || id >= 1000000L
    val evalGrams = all.collect { case (id, t) if isEval(id) => grams(t) }
      .foldLeft(Set.empty[Seq[String]])(_ ++ _)
    val expected = all.collect {
      case (id, t) if !isEval(id) && (grams(t) & evalGrams).nonEmpty =>
        id -> (grams(t) & evalGrams).size.toLong
    }
    assert(flagged === expected, "d15 diverged from the JVM replay")
    // non-vacuity: every 14+-token planted clone SOURCE is a train doc
    // sharing its whole tail with its eval clone — all must be flagged
    val sources = raw.collect { case (id, t) if id % 100 == 50 && t.length >= 14 => id }
    assert(sources.nonEmpty && sources.forall(flagged.contains),
      "a planted clone source escaped decontamination")
  }

  test("t57: per-source dedup attrition equals a JVM replay; clone-heavy sources visibly shrink") {
    val out = Dedup.dedupAttritionBySource(spark, sf0001)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("kept_frac_e4"))))
      .toMap
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    // the graded d1/d2 planted corpus: clones of the first DupCloneCount
    // docs under offset ids
    val docs = raw ++ raw.filter(_._1 < Dedup.DupCloneCount)
      .map(r => (r._1 + Dedup.DupCloneOffset, r._2, r._3))
    val keeper = docs.groupBy(_._3).view.mapValues(_.map(_._1).min).values.toSet
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      def tk(t: String) = t.count(_ == ' ').toLong + 1
      val n = rows.length.toLong
      val tks = rows.map(r => tk(r._3)).sum
      val kd = rows.count(r => keeper(r._1)).toLong
      val ktk = rows.filter(r => keeper(r._1)).map(r => tk(r._3)).sum
      src -> ((n, tks, kd, ktk, math.floor(ktk.toDouble / tks * 10000.0 + 0.5).toLong))
    }
    assert(out === expected, "t57 diverged from the JVM replay")
    // non-vacuity: dedup bites somewhere (some source loses tokens) and
    // no source loses everything
    assert(out.values.exists(v => v._4 < v._2), "no source lost any tokens — vacuous")
    assert(out.values.forall(_._3 > 0L), "a source lost every document")
  }

  test("d16: threshold sensitivity curve equals an independent JVM all-pairs replay") {
    val out = Dedup.thresholdSensitivity(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // independent replay: brute-force all-pairs jaccard over driver-side
    // shingle sets (the inverted index and caps replayed from the spec)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh0 = docs.map { case (id, t) =>
      val toks = t.split(" ")
      id -> (if (toks.length < 3) Set.empty[String]
             else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val df = sh0.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val sh = sh0.map { case (id, ss) => id -> ss.filter(df(_) <= Dedup.DefaultMaxDocFreq) }
    val ids = docs.map(_._1).sorted
    val buckets = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sh(ids(i)); b = sh(ids(j))
      common = (a & b).size if common > 0
      jac = common.toDouble / (a.size + b.size - common)
      bk = math.floor(jac * 20).toLong if bk >= Dedup.SweepFloorBucket
    } yield bk
    val hist = buckets.groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val expected = hist.map { case (b, n) =>
      (b * 5) -> ((n, hist.filter(_._1 >= b).values.sum))
    }
    assert(out === expected, "d16 diverged from the all-pairs replay")
    // non-vacuity: the curve must span >1 bucket and be monotone in ge
    assert(out.size > 1)
    val sorted = out.toSeq.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Seq((_, (_, ge1)), (_, (_, ge2))) => ge1 >= ge2
      case _ => true
    })
  }

  test("t55: per-host quota keeps exactly the top-quality docs per host; TopKPerKey plan, no window") {
    import org.apache.spark.sql.functions.col
    val out = Dedup.hostQuotaKeep(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"),
        r.getAs[Long]("quality_e4"), r.getAs[Int]("host_rank")))
    // replay from the two independently-tested building blocks: the d14
    // canonical host and the graded t2 quality frame
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val host = Dedup.plantedCrawlUrls(docs)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.regexp_extract(
          Dedup.canonicalUrlCol(col("url")), "^([^/?]+)", 1).as("host"))
      .as[(Long, String)].collect().toMap
    val quality = graft.operators.TextAnalysis.qualityScores(spark, sf0001)
      .select(col("doc_id"), col("quality_e4"))
      .as[(Long, Long)].collect().toMap
    val expected = host.groupBy(_._2).flatMap { case (h, members) =>
      members.keys.toSeq
        .sortBy(id => (-quality(id), id))
        .take(Dedup.HostQuota)
        .zipWithIndex
        .map { case (id, i) => (id, h, quality(id), i + 1) }
    }.toSet
    assert(out.toSet === expected, "t55 diverged from the JVM replay")
    // the quota binds: the planted crawl has 5 hosts × ~100 docs each
    assert(out.length === 5 * Dedup.HostQuota)
    // plan: bounded per-host heaps, not a full-host window sort
    val plan = Dedup.hostQuotaKeep(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected the TopKPerKey node:\n$plan")
    assert(!plan.contains("Window"), s"expected no window sort:\n$plan")
  }

  test("d17 histogram partitions the clustered docs; t59 weights are 1/size and total") {
    import org.apache.spark.sql.functions._
    val clusters = Dedup.duplicateClusters(spark, sf0001).cache()
    val nClustered = clusters.count()
    val hist = Dedup.clusterSizeHistogram(clusters)
      .as[(Long, Long)].collect().toMap
    // the histogram is a partition of the label frame...
    assert(hist.map { case (sz, n) => sz * n }.sum === nClustered)
    // ...with at least one genuine multi-doc cluster on this corpus
    assert(hist.keys.max >= 2L, s"no multi-doc cluster in $hist")

    val weights = graft.operators.TrainingPrep
      .softDedupWeights(spark, sf0001, clusters).cache()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // every document gets exactly one weight row
    assert(weights.count() === total)
    assert(weights.select("doc_id").distinct().count() === total)
    // members of a k-cluster weigh 10000 div k; unclustered docs weigh 10000
    val sizes = clusters.groupBy(col("cluster_id")).count()
      .withColumnRenamed("count", "sz")
    val bad = weights.join(clusters, Seq("doc_id"), "left")
      .join(sizes, Seq("cluster_id"), "left")
      .filter(col("weight_e4") =!= expr("10000 div coalesce(sz, 1)"))
    assert(bad.count() === 0L, s"weight mismatch: ${bad.take(3).mkString(";")}")
    // the soft gate is non-vacuous: some doc is down-weighted, none zeroed
    assert(weights.filter(col("weight_e4") < 10000L).count() > 0L)
    assert(weights.filter(col("weight_e4") <= 0L).count() === 0L)

    // t62: the per-source budget is consistent with the weights — the
    // effective tokens never exceed raw, the discount is a valid e4
    // share, and a source with no clustered docs keeps its full budget
    val budget = graft.operators.TrainingPrep
      .softDedupBudget(spark, sf0001, clusters).cache()
    budget.as[(String, Long, Long, Long, Long)].collect().foreach {
      case (src, nd, raw, eff, disc) =>
        assert(nd > 0L && raw > 0L, src)
        assert(eff <= raw && eff > 0L, s"$src eff=$eff raw=$raw")
        assert(disc === eff * 10000L / raw, src)
    }
    assert(budget.filter(col("dedup_discount_e4") < 10000L).count() > 0L,
      "soft dedup discounted no source — vacuous")
    clusters.unpersist(); weights.unpersist(); budget.unpersist()
  }

  test("d18: 1-bit estimate recomputes exactly from the signatures and tracks jaccard") {
    import org.apache.spark.sql.functions._
    val est = Dedup.bbitMinhashEstimate(spark, sf0001).cache()
    val pairs = Dedup.minhashLshPairs(spark, sf0001)
    // one estimate row per verified d4 pair, nothing invented
    assert(est.count() === pairs.count())
    assert(est.filter(col("bbit_est_e4") < -10000L || col("bbit_est_e4") > 10000L)
      .count() === 0L)
    // independent recomputation: for a sample of pairs, re-derive the
    // 1-bit match count straight from the signature frame and pin the
    // operator's integer estimate exactly
    val sigRows = Dedup.minhashSignatures(Dedup.shingles(spark, sf0001)).collect()
    val bits = sigRows.map(r =>
      r.getLong(0) -> (1 to 32).map(i => r.getLong(i) % 2).toArray).toMap
    est.select("a", "b", "bbit_est_e4").as[(Long, Long, Long)]
      .collect().take(8).foreach { case (a, b, e) =>
        val m = bits(a).zip(bits(b)).count { case (x, y) => x == y }
        assert(e === m.toLong * 625L - 10000L, s"pair ($a,$b)")
      }
    // 32 one-bit trials are noisy (σ ≈ 0.18 on Ĵ) but the estimator must
    // still track: mean |err| well under the all-noise level
    val meanErr = est.agg(avg(col("abs_err_e4"))).head().getDouble(0)
    assert(meanErr < 4000.0, s"mean abs err $meanErr")
    est.unpersist()
  }

  test("t60: per-suite leakage report — planted clones land in suite 2, rates bounded") {
    import org.apache.spark.sql.functions._
    val rep = Dedup.contaminationReport(spark, sf0001, plantClones = true).cache()
    val rows = rep.as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the deterministic doc_id % 4 partition yields all four suites
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
    rows.values.foreach { case (_, ne, nl, nd, rate) =>
      assert(ne > 0L); assert(nl >= 0L && nl <= ne)
      assert(rate >= 0L && rate <= 10000L)
      assert((nl == 0L) == (nd == 0L))
    }
    // every planted clone id (orig % 100 == 50, +10^6 ≡ 0 mod 4) lands in
    // suite 2, so that suite is provably leaked
    assert(rows(2L)._3 > 0L, s"suite 2 reports no leakage: $rows")
    rep.unpersist()
  }

  test("t58 blocklist: exact, subdomain-suffix, and longest-rule-wins semantics") {
    import org.apache.spark.sql.functions._
    val out = Dedup.domainBlocklistGate(spark, sf0001).cache()
    val byId = out.select("doc_id", "host", "blocked", "matched_rule")
      .as[(Long, String, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 2: site2.example.org — blocked by the EXACT rule
    assert(byId(2L) === (("site2.example.org", true, Some("site2.example.org"))))
    // doc 12: cdn.site2.example.org — blocked as a SUBDOMAIN of the rule
    assert(byId(12L) === (("cdn.site2.example.org", true, Some("site2.example.org"))))
    // doc 21: cdn.site1.example.net matches BOTH example.net and
    // site1.example.net — the longer (more specific) rule must win
    assert(byId(21L) === (("cdn.site1.example.net", true, Some("site1.example.net"))))
    // doc 7: site2.example.net — only the TLD-level rule matches
    assert(byId(7L) === (("site2.example.net", true, Some("example.net"))))
    // doc 4: site4.example.org matches nothing (cdn.site4.example.org is
    // MORE specific than the host — a rule never blocks its parent)
    assert(byId(4L) === (("site4.example.org", false, None)))
    // the gate both blocks and keeps at corpus level
    assert(out.filter(col("blocked")).count() > 0L)
    assert(out.filter(!col("blocked")).count() > 0L)
    assert(out.count() === spark.read.parquet(s"$sf0001/documents.parquet").count())
    out.unpersist()
  }
}
