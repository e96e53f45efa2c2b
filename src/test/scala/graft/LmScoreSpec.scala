package graft

import org.apache.spark.sql.functions._

import graft.operators.LmScore

/** Invariants for the LM-scoring curation layer (t31/t32/t33). The exact
  * cross-engine values are pinned by the DuckDB oracle via Verify; these
  * tests pin the semantic contracts the oracle can't see.
  */
class LmScoreSpec extends SparkSuite {

  test("t31: every doc scored once, nll positive, buckets ordered by avg nll") {
    val out = LmScore.bigramLmScores(spark, sf0001).cache()
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() === nDocs)
    assert(out.filter(col("nll_sum_e6") <= 0).count() === 0)
    // bucket ↔ threshold consistency: head avg < middle avg < tail avg
    val avg = out.groupBy(col("ppl_bucket"))
      .agg((sum(col("nll_sum_e6")) / sum(col("n_bigrams"))).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (b <- Seq("head", "middle", "tail")) assert(avg.contains(b), s"empty bucket $b")
    assert(avg("head") < avg("middle") && avg("middle") < avg("tail"))
    out.unpersist()
  }

  test("t31: a doc's nll equals the integer sum of its bigrams' model nll") {
    // re-derive one document's score by hand from the model definition
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val text = docs.filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    val toks = text.split(" ")
    val allToks = docs.select(explode(split(col("text"), " ")).as("t"))
      .select(col("t")).collect().map(_.getString(0))
    val v = allToks.distinct.length
    val bigrams = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect().flatMap(r => r.getSeq[String](1).sliding(2).collect {
        case Seq(u, w) => (u, w)
      })
    val cuw = bigrams.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val cu = bigrams.groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    val expected = toks.sliding(2).collect { case Array(u, w) =>
      math.floor(-math.log((cuw((u, w)) + 1).toDouble / (cu(u) + v)) * 1e6 + 0.5).toLong
    }.sum
    val got = LmScore.bigramLmScores(spark, sf0001)
      .filter(col("doc_id") === 0).select(col("nll_sum_e6")).head().getLong(0)
    assert(got === expected)
  }

  test("t35: trigram nll matches a pure-JVM interpolated-LM reference for one doc") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val all = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val tri = all.values.flatMap(_.sliding(3).filter(_.length == 3).map(a => (a(0), a(1), a(2))))
      .toSeq
    val bi = all.values.flatMap(_.sliding(2).filter(_.length == 2).map(a => (a(0), a(1)))).toSeq
    val uni = all.values.flatten.toSeq
    val cuvw = tri.groupBy(identity).map { case (k, v) => k -> v.size }
    val cuv = tri.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size }
    val cvw = bi.groupBy(identity).map { case (k, v) => k -> v.size }
    val cv = bi.groupBy(_._1).map { case (k, v) => k -> v.size }
    val cw = uni.groupBy(identity).map { case (k, v) => k -> v.size }
    val n = uni.size
    val vsz = uni.distinct.size
    val target = 3L
    val expected = all(target).sliding(3).filter(_.length == 3).map { a =>
      val t = (a(0), a(1), a(2))
      val p = LmScore.Lambda3 * cuvw(t).toDouble / cuv((a(0), a(1))) +
        LmScore.Lambda2 * cvw((a(1), a(2))).toDouble / cv(a(1)) +
        LmScore.Lambda1 * (cw(a(2)) + 1).toDouble / (n + vsz)
      math.floor(-math.log(p) * 1e6 + 0.5).toLong
    }.sum
    val got = LmScore.trigramLmScores(spark, sf0001)
      .filter(col("doc_id") === target).select(col("nll_sum_e6")).head().getLong(0)
    assert(got === expected)
    // interpolation gives sharper (lower-nll) predictions than add-one
    // bigram on this corpus for most docs — sanity that the model differs
    val t31 = LmScore.bigramLmScores(spark, sf0001)
      .select(col("doc_id"), col("nll_sum_e6").as("b6"), col("n_bigrams"))
    val joined = LmScore.trigramLmScores(spark, sf0001).join(t31, "doc_id")
      .select((col("nll_sum_e6") / col("n_trigrams") <
        col("b6") / col("n_bigrams")).as("sharper"))
      .collect()
    assert(joined.count(_.getBoolean(0)) > joined.length / 2)
  }

  test("t32: weights cover exactly the raw pool and selection is avg-threshold") {
    val out = LmScore.dsirWeights(spark, sf0001).cache()
    assert(out.filter(col("doc_id") < LmScore.DsirTargetCutoff).count() === 0)
    val nRaw = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") >= LmScore.DsirTargetCutoff)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() === nRaw)
    val bad = out.filter(
      (col("logw_sum_e6") >= lit(LmScore.DsirSelectE6) * col("n_feats")) =!= col("selected"))
    assert(bad.count() === 0)
    // both classes populated at sf0.001 (cutoffs are non-vacuous)
    assert(out.filter(col("selected")).count() > 0)
    assert(out.filter(!col("selected")).count() > 0)
    out.unpersist()
  }

  test("t33: k rows per query, ranked by score desc with doc_id tie-break") {
    val out = LmScore.bm25TopK(spark, sf0001).cache()
    val perQ = out.groupBy(col("query_id")).count().collect()
    assert(perQ.length === LmScore.Bm25Queries.length)
    perQ.foreach(r => assert(r.getLong(1) === LmScore.Bm25K))
    val rows = out.orderBy(col("query_id"), col("rn")).collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, qs) =>
      val sorted = qs.sortBy(_.getInt(3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getLong(2), b.getLong(2))
          assert(sa > sb || (sa == sb && a.getLong(1) < b.getLong(1)))
        case _ => ()
      }
    }
    out.unpersist()
  }

  test("t32i: persisted-features weighting is bit-equal to the inline pass") {
    val path = java.nio.file.Files.createTempDirectory("dsiridx").toString
    LmScore.buildDsirFeatures(spark, sf0001, path)
    val cold = LmScore.dsirWeights(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).sorted
    val indexed = LmScore.dsirWeightsIndexed(spark, sf0001, path).collect()
      .map(_.toSeq.mkString("|")).sorted
    assert(indexed === cold)
  }

  test("t31i: persisted-model scoring is bit-equal to the inline pass") {
    val path = java.nio.file.Files.createTempDirectory("lmidx").toString
    LmScore.buildModel(spark, sf0001, path)
    val cold = LmScore.bigramLmScores(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).sorted
    val indexed = LmScore.bigramLmScoresIndexed(spark, sf0001, path).collect()
      .map(_.toSeq.mkString("|")).sorted
    assert(indexed === cold)
  }

  test("persisted model scores unseen text through the unk fallbacks") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lmunk").toString
    LmScore.buildModel(spark, sf0001, path)
    // "join" is in-vocab (seen context), "zzz" is out-of-vocab
    val novel = Seq((9001L, "join zzz join"), (9002L, "zzz zzz"))
      .toDF("doc_id", "text")
    val out = LmScore.scoreWithModel(novel, path)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val global = spark.read.parquet(s"$path/global").head()
    val v = global.getLong(0)
    val unkJoin = spark.read.parquet(s"$path/unk")
      .filter(col("u") === "join").head().getLong(1)
    // doc 9001: (join,zzz) → unk mass of context "join"; (zzz,join) → 1/V floor
    val lnV = math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong
    assert(out(9001L) === unkJoin + lnV)
    // doc 9002: single bigram of two unseen tokens → one 1/V floor
    assert(out(9002L) === lnV)
  }

  test("streaming scorer over micro-batches equals the cold batch pass") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("lmstream").toString
    LmScore.buildModel(spark, sf0001, path)
    val outPath = java.nio.file.Files.createTempDirectory("lmverdicts").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lmckpt").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val q = LmScore.scoreIngestStream(
      stream.toDF().toDF("doc_id", "text"), path, outPath, ckpt)
    docs.grouped(200).foreach { g => stream.addData(g.toSeq); q.processAllAvailable() }
    q.stop()
    def verdicts() = spark.read.parquet(outPath)
      .select(col("doc_id"), col("n_bigrams"), col("nll_sum_e6"), col("ppl_bucket"))
      .collect().map(_.toSeq.mkString("|")).sorted
    val cold = LmScore.bigramLmScores(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).sorted
    assert(verdicts() === cold)
    // crash-replay: redelivering a batch overwrites its own partition —
    // no duplicate verdicts appear
    val replay = spark.createDataFrame(
      spark.sparkContext.parallelize(
        docs.take(200).map(t => org.apache.spark.sql.Row(t._1, t._2)).toSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    LmScore.scoreIngestBatch(replay, path, outPath, 0L)
    assert(verdicts() === cold)
  }

  test("t44: NB classification equals the DIRECT per-candidate formulation on the JVM") {
    // the Spark plan scores via the additive decomposition
    // prior + n·unk + Σ(nll−unk); this reference computes the naive
    // per-(doc, candidate) sum directly — bit-equality pins the
    // decomposition, the e6 quantization points, and the argmin tie-break
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val occ = docs.flatMap { case (id, l, t) => t.split(" ", -1).map(tok => (l, tok)) }
    val clt = occ.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val cl = occ.groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    val v = occ.map(_._2).distinct.length.toLong
    val dl = docs.groupBy(_._2).map { case (k, vs) => k -> vs.length.toLong }
    val d = docs.length.toLong
    def e6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val langs = cl.keys.toSeq.sorted
    val unk = langs.map(l => l -> e6(math.log((cl(l) + v).toDouble))).toMap
    val prior = langs.map(l => l -> e6(-math.log(dl(l).toDouble / d))).toMap
    val expected = docs.map { case (id, l, t) =>
      val best = langs.map { c =>
        val s = prior(c) + t.split(" ", -1).map { tok =>
          clt.get((c, tok))
            .map(n => e6(-math.log((n + 1).toDouble / (cl(c) + v))))
            .getOrElse(unk(c))
        }.sum
        (s, c)
      }.min
      Seq(id, l, best._2, l == best._2, best._1).mkString("|")
    }.sorted
    val got = LmScore.nbLangScores(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).sorted
    assert(got === expected)
  }

  test("t44i: persisted-model classification is bit-equal to the inline pass") {
    val path = java.nio.file.Files.createTempDirectory("nbidx").toString
    LmScore.buildNbModel(spark, sf0001, path)
    val cold = LmScore.nbLangScores(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).sorted
    val indexed = LmScore.nbLangScoresIndexed(spark, sf0001, path).collect()
      .map(_.toSeq.mkString("|")).sorted
    assert(indexed === cold)
  }

  test("t45: confusion matrix is exactly the per-(label, prediction) census of t44") {
    val path = java.nio.file.Files.createTempDirectory("nbconf").toString
    LmScore.buildNbModel(spark, sf0001, path)
    val verdicts = LmScore.nbLangScores(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expected = verdicts.groupBy(identity)
      .map { case ((l, p), vs) => (l, p, vs.length.toLong) }.toSet
    val got = LmScore.nbLangConfusion(spark, sf0001, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    // totals cover every doc once; the diagonal is the correct count
    assert(got.toSeq.map(_._3).sum === verdicts.length.toLong)
    assert(got.filter(t => t._1 == t._2).map(_._3).sum ===
      verdicts.count { case (l, p) => l == p }.toLong)
  }

  test("t46: precision/recall/F1 + macro row replay a JVM reference over the confusion cells") {
    val path = java.nio.file.Files.createTempDirectory("nbqual").toString
    LmScore.buildNbModel(spark, sf0001, path)
    val cells = LmScore.nbLangConfusion(spark, sf0001, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // independent reference: sklearn-style per-class metrics from the cells
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val langs = (cells.map(_._1) ++ cells.map(_._2)).distinct
    val ref = langs.map { l =>
      val support = cells.filter(_._1 == l).map(_._3).sum
      val predicted = cells.filter(_._2 == l).map(_._3).sum
      val tp = cells.filter(c => c._1 == l && c._2 == l).map(_._3).sum
      val p = if (predicted == 0) 0.0 else tp.toDouble / predicted
      val r = if (support == 0) 0.0 else tp.toDouble / support
      val f1 = if (p + r == 0.0) 0.0 else 2.0 * p * r / (p + r)
      (l, support, predicted, tp, e6(p), e6(r), e6(f1))
    }
    val macroRef = ("[macro]", ref.map(_._2).sum, ref.map(_._3).sum,
      ref.map(_._4).sum,
      math.floor(ref.map(_._5).sum.toDouble / ref.length + 0.5).toLong,
      math.floor(ref.map(_._6).sum.toDouble / ref.length + 0.5).toLong,
      math.floor(ref.map(_._7).sum.toDouble / ref.length + 0.5).toLong)
    val got = LmScore.nbLangQuality(spark, sf0001, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === (ref :+ macroRef).toSet)
  }

  test("t44: a frozen model classifies all-unseen text through the per-lang unk floor") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("nbunk").toString
    LmScore.buildNbModel(spark, sf0001, path)
    val toks = Seq("ZZxQ97a", "WWyR42b")
    assert(spark.read.parquet(s"$path/model")
      .filter(col("tok").isin(toks: _*)).count() === 0, "test tokens must be novel")
    val novel = Seq((9001L, "en", toks.mkString(" "))).toDF("doc_id", "lang", "text")
    val out = LmScore.classifyWithNbModel(novel, path).head()
    val unk = spark.read.parquet(s"$path/unk").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val prior = spark.read.parquet(s"$path/prior").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every candidate sees only its floor: prior + 2·unk; argmin decides
    val best = unk.keys.toSeq.sorted.map(l => (prior(l) + 2 * unk(l), l)).min
    assert(out.getString(2) === best._2)
    assert(out.getLong(4) === best._1)
  }

  test("t36: RRF fuses both retriever lists — reciprocal-rank sums, k rows per query") {
    val out = LmScore.rrfFusion(spark, sf0001).cache()
    val perQ = out.groupBy(col("query_id")).count().collect()
    assert(perQ.length === LmScore.Bm25Queries.length)
    perQ.foreach(r => assert(r.getLong(1) === LmScore.RrfTopK))
    // a doc ranked 1 by BOTH lists scores exactly 2·e6(1/(k+1)); the
    // maximum possible fused score — and every score is a sum of at most
    // two reciprocal terms
    val maxTerm = math.floor(1.0 / (LmScore.RrfK + 1) * 1e6 + 0.5).toLong
    assert(out.filter(col("rrf_e6") > 2 * maxTerm).count() === 0)
    assert(out.filter(col("rrf_e6") <= 0).count() === 0)
    // fusion actually drew from both lists: some fused doc carries a
    // two-list score strictly above the best single-list score
    assert(out.filter(col("rrf_e6") > maxTerm).count() > 0,
      "no doc fused contributions from both retrievers — fusion vacuous")
    out.unpersist()
  }

  test("property: bigram LM equals the pure-JVM reference on random corpora") {
    import spark.implicits._
    // deterministic pseudo-random word-soup corpora over a small vocab —
    // different sizes/skews per seed, no fixed-corpus blind spots
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    for (seed <- Seq(7L, 23L, 101L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 40L).map { id =>
        val len = 2 + rnd.nextInt(30)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"lmprop$seed").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      // pure-JVM reference: identical definitions, scalar arithmetic
      val bigrams = docs.flatMap { case (id, t) =>
        t.split(" ").sliding(2).collect { case Array(u, w) => (id, u, w) } }
      val cuw = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
      val cu = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val v = docs.flatMap(_._2.split(" ")).distinct.size
      val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
        id -> bs.map { case (_, u, w) =>
          math.floor(-math.log((cuw((u, w)) + 1).toDouble / (cu(u) + v)) * 1e6 + 0.5).toLong
        }.sum
      }
      val got = LmScore.bigramLmScores(spark, dir)
        .select(col("doc_id"), col("nll_sum_e6"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed $seed diverged")
    }
  }

  test("t33: ranking runs through the TopKPerKey node, not a full sort") {
    val plan = LmScore.bm25TopK(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey node in:\n$plan")
  }

  test("t48: labels follow the curated-source slice; one verdict per doc") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = LmScore.qualityClassifierKeep(spark, sf0001).cache()
    assert(out.count() === docs.count(), "one verdict per document")
    val mislabeled = out.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(
        (col("source").isin(LmScore.QualityRefSources: _*) && col("label") =!= "hiq") ||
        (!col("source").isin(LmScore.QualityRefSources: _*) && col("label") =!= "loq"))
    assert(mislabeled.count() === 0)
    out.unpersist()
  }

  test("t48: the pareto keep rule replays row-for-row from its own columns") {
    val rows = LmScore.qualityClassifierKeep(spark, sf0001)
      .select("margin_tok_e6", "score_e6", "thresh_hex", "draw_hex", "keep")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, s6, th, dr, keep) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4))
      // scalar JVM replay of the whole chain from the integer margin
      val s = 1.0 / (1.0 + math.exp(-m.toDouble / 1e6))
      assert(s6 === math.floor(s * 1e6 + 0.5).toLong, s"score mismatch at margin $m")
      val uStar = 1.0 - math.pow(2.0 - s, -LmScore.QualityParetoAlpha.toDouble)
      assert(th === f"${math.floor(uStar * 4294967296.0).toLong}%08x")
      assert(keep === (dr > th), "keep must be exactly the hex compare")
      // and the hex compare IS the pareto rule: draw > thresh ⟺
      // pareto(u) > 1 - s for u on the 2^32 grid above/below the edge
      val u = java.lang.Long.parseLong(dr, 16).toDouble / 4294967296.0
      val pareto = math.pow(1.0 - u, -1.0 / LmScore.QualityParetoAlpha) - 1.0
      if (math.abs(u - uStar) > 1e-9) // off the grid edge the forms agree
        assert(keep === (pareto > 1.0 - s), s"pareto form diverged at margin $m")
    }
  }

  test("t53: calibration bins partition the corpus and re-aggregate the t48 verdicts") {
    val cal = LmScore.qualityCalibration(spark, sf0001).cache()
    val t48 = LmScore.qualityClassifierKeep(spark, sf0001).cache()
    val n = t48.count()
    assert(cal.agg(sum(col("n_docs"))).collect()(0).getLong(0) === n)
    assert(cal.filter(
      col("bin") < LmScore.CalibrationBinLo ||
        col("bin") > LmScore.CalibrationBinHi).count() === 0)
    // realized keep mass re-derives: Σ bin round(rate·n)⁻¹ cannot be
    // checked exactly through the e4 rounding, so recompute from counts
    val keptFromBins = cal
      .select((col("n_docs") * col("keep_rate_e4")).as("m"))
      .agg(sum(col("m"))).collect()(0).getLong(0)
    val keptTrue = t48.filter(col("keep")).count()
    // e4 rounding error per bin is < n_docs/2·1e-4 — bound the drift
    assert(math.abs(keptFromBins - keptTrue * 10000L) <= n / 2,
      s"bin keep mass $keptFromBins vs ${keptTrue * 10000L}")
    cal.unpersist(); t48.unpersist()
  }

  test("t48: higher margin never lowers the keep threshold (monotone lottery)") {
    val rows = LmScore.qualityClassifierKeep(spark, sf0001)
      .select("margin_tok_e6", "thresh_hex").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((m1, t1), (m2, t2)) =>
        assert(t2 <= t1, s"threshold rose from margin $m1 to $m2")
      case _ =>
    }
  }
}
