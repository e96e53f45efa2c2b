package graft

import org.apache.spark.sql.functions.col

import graft.operators.{MultimodalOps, TextAnalysis}

/** Text-analysis formulas + multimodal plumbing. */
class TextMultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("token stats: counts match a scala tokenizer on real docs") {
    val rows = TextAnalysis.tokenStats(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.take(50).foreach { case (id, nChars, nTokens, avgLenE4) =>
      val toks = texts(id).split(" ")
      assert(nTokens === toks.length, s"doc $id")
      assert(nChars === texts(id).length)
      val expected = toks.map(_.length).sum.toDouble / toks.length
      assert(math.abs(avgLenE4 / 10000.0 - expected) < 1e-3)
    }
  }

  test("lang-id prediction is one of the supported languages") {
    val preds = TextAnalysis.langId(spark, sf0001)
      .select("lang_pred").distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("en", "es", "de", "fr")))
  }

  test("fingerprints: md5 equals the JVM digest") {
    val row = TextAnalysis.fingerprints(spark, sf0001)
      .filter("doc_id = 0").as[(Long, String, String)].head()
    val text = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter("doc_id = 0").select("text").as[String].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row._2 === exp)
  }

  test("winnowing: identical docs share fingerprints; guarantee property holds") {
    import org.apache.spark.sql.functions._
    import graft.functions.Winnowing.winnow
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shared = "common shared middle section here"
    val a = s"$base $shared"
    val b = s"completely different prefix text $shared"
    val rows = Seq(("a", a), ("a2", a), ("b", b)).toDF("id", "t")
      .select(col("id"), winnow(col("t")).as("fp"))
      .as[(String, Seq[Long])].collect().toMap
    // determinism: same text, same fingerprint
    assert(rows("a") === rows("a2"))
    // winnowing guarantee: substring of length >= w+k-1 (=8) shared by a
    // and b -> at least one common fingerprint entry
    assert(rows("a").toSet.intersect(rows("b").toSet).nonEmpty)
    // fingerprints are much smaller than the k-gram count (compression)
    assert(rows("a").size < a.length - 5 + 1)
  }

  test("winnowing candidates surface the planted near-duplicate pair") {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val t1 = (1 to 80).map(i => s"w$i").mkString(" ")
    val t2 = t1 + " tail extension"
    val t3 = (200 to 280).map(i => s"q$i").mkString(" ")
    Seq((1L, t1, "en", "s", t1.length.toLong), (2L, t2, "en", "s", t2.length.toLong),
      (3L, t3, "en", "s", t3.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cands = TextAnalysis.winnowCandidates(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(cands === Set((1L, 2L)))
  }

  test("chunking covers every token and respects stride/size") {
    import graft.operators.TrainingPrep
    val chunks = TrainingPrep.chunks(spark, sf0001)
      .as[(Long, Int, Long, String)].collect()
    val docTokens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
      .view.mapValues(_.split(" ").length).toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet === docTokens.keySet)
    byDoc.foreach { case (id, cs) =>
      val n = docTokens(id)
      // number of windows with stride 32
      assert(cs.length === math.ceil(n / 32.0).toInt, s"doc $id")
      // chunk 0 is full-size (or the whole doc when shorter than a window)
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === math.min(64, n))
      // token counts line up with window/stride coverage of the document
      assert(sorted.last._3 === n - 32L * (cs.length - 1))
    }
  }

  test("exact stratified sample fills each stratum's quota, repartition-invariant") {
    import graft.operators.TrainingPrep
    val out = TrainingPrep.exactStratifiedSample(spark, sf0001).cache()
    val perLang = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === perLang.keySet)
    got.foreach { case (l, n) =>
      assert(n === math.min(TrainingPrep.StratumQuota.toLong, perLang(l)))
    }
    // membership is a pure function of the ids — identical at any layout
    val viaOne = graft.plans.TopKPerKey(
        spark.read.parquet(s"$sf0001/documents.parquet").repartition(1)
          .select(col("doc_id"), col("lang"),
            org.apache.spark.sql.functions.md5(
              org.apache.spark.sql.functions.concat(col("doc_id").cast("string"),
                org.apache.spark.sql.functions.lit("|t37")).cast("binary")).as("k")),
        Seq(col("lang")), Seq(col("k"), col("doc_id")), TrainingPrep.StratumQuota)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.select(col("doc_id")).collect().map(_.getLong(0)).toSet === viaOne)
    out.unpersist()
  }

  test("data card: grand total reconciles with the corpus, rollup levels consistent") {
    import graft.operators.TrainingPrep
    val card = TrainingPrep.dataCard(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val total = card.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length === 1)
    assert(total.head.getLong(2) === docs.count())
    // per-source subtotals sum to the grand total
    val perSource = card.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(perSource.map(_.getLong(2)).sum === docs.count())
    assert(perSource.map(_.getLong(4)).sum === total.head.getLong(4))
  }

  test("stratified sample is a pure function of the row and respects strata") {
    import graft.operators.TrainingPrep
    val a = TrainingPrep.stratifiedSample(spark, sf0001).as[(Long, String)].collect().toSet
    // hash-gated selection must be identical under a different partitioning
    val b = TrainingPrep.stratifiedSample(spark, sf0001)
      .repartition(7).as[(Long, String)].collect().toSet
    assert(a === b)
    val total = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = a.groupBy(_._2).view.mapValues(_.size).toMap
    // non-en strata kept fully; en down-sampled near the 64/256 rate
    Seq("de", "fr", "es", "zh").foreach { l =>
      assert(sampled.getOrElse(l, 0) === total(l).toInt, l)
    }
    assert(sampled("en") < total("en") * 0.6)
    assert(sampled("en") > 0)
    // a language with no configured stratum is dropped entirely
    val onlyEn = TrainingPrep.stratifiedSample(spark, sf0001, rates = Map("en" -> 1.0))
      .as[(Long, String)].collect()
    assert(onlyEn.nonEmpty && onlyEn.forall(_._2 == "en"))
  }

  test("domain counts surface the planted links with exact frequencies") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.domainCounts(spark, sf0001, plantUrls = true)
      .as[(String, Long, Long)].collect()
    val byDomain = rows.map(r => r._1 -> (r._2, r._3)).toMap
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").as[Long].collect()
    val cdnDocs = ids.count(_ % 21 == 0).toLong
    assert(byDomain("cdn.example.net") === ((cdnDocs, cdnDocs)))
    // 13 site buckets; every planted doc contributes exactly one site link
    val siteTotal = rows.filter(_._1.startsWith("site")).map(_._3).sum
    assert(siteTotal === ids.count(_ % 7 == 0).toLong)
    // unplanted corpus has no URLs at all
    assert(TextAnalysis.domainCounts(spark, sf0001).count() === 0L)
  }

  test("imageio decode: real PNG fixtures through the mapPartitions codec path") {
    // deterministic in-test PNG fixtures via the JDK's own encoder — no
    // external assets, bit-stable across runs
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer missing")
      out.toByteArray
    }
    // solid mid-gray: luma = (77+150+29)*128 >> 8 = 128 exactly → all
    // pixels land in bin 8, so the L2-normalized histogram is a unit
    // one-hot and the mean is integer-exact
    val gray = png(8, 4)((_, _) => 0x808080)
    // black/white checker: luma 0 (bin 0) and 255 (bin 15), half each
    val checker = png(4, 4)((x, y) => if ((x + y) % 2 == 0) 0x000000 else 0xFFFFFF)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)

    val df = Seq(
      (1L, gray), (2L, checker), (3L, garbage), (4L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val got = MultimodalOps.imageFeatures(df).collect().map(f => f.doc_id -> f).toMap
    assert(got.size === 4)

    val g = got(1L)
    assert(g.decode_ok && g.width === 8 && g.height === 4 && g.n_pixels === 32L)
    assert(g.mean_lum_e4 === 128L * 10000, s"gray mean: ${g.mean_lum_e4}")
    assert(g.feat(8) === 1.0f && g.feat.zipWithIndex.filter(_._2 != 8).forall(_._1 == 0f),
      s"gray histogram not one-hot: ${g.feat}")
    assert(g.feat_norm_e4 === 10000L)

    val c = got(2L)
    assert(c.decode_ok && c.n_pixels === 16L)
    // BT.601 luma of pure white: (77+150+29)*255 >> 8 = 255 exactly
    assert(c.mean_lum_e4 === math.floor((8 * 0 + 8 * 255) / 16.0 * 10000 + 0.5).toLong)
    val inv = (1.0 / math.sqrt(2.0)).toFloat
    assert(c.feat(0) === inv && c.feat(15) === inv,
      s"checker bins 0/15 should each hold 1/sqrt2: ${c.feat}")

    // corrupt + empty payloads come back in-band, never as an exception
    assert(!got(3L).decode_ok && got(3L).feat.isEmpty)
    assert(!got(4L).decode_ok && got(4L).n_pixels === 0L)
  }

  test("t40 expectations: every check trips on a deliberately corrupted corpus") {
    import graft.operators.Expectations
    import org.apache.spark.sql.functions.{col, lit}
    val base = java.nio.file.Files.createTempDirectory("expect")
    try {
      // corrupted documents: an empty text, a duplicate doc_id, a bogus
      // lang, an n_chars that disagrees with the text, and a 3000-char doc
      Seq(
        (1L, "ok text here", "en", 12L),
        (1L, "dup id", "en", 6L),            // duplicate doc_id
        (2L, "", "en", 0L),                  // empty text
        (3L, "bad lang", "xx", 8L),          // not an accepted value
        (4L, "short", "de", 99L),            // n_chars inconsistent
        (5L, "x" * 3000, "fr", 3000L))       // over the max bound
        .toDF("doc_id", "text", "lang", "n_chars")
        .write.parquet(s"$base/documents.parquet")
      Seq((10L, 1L), (11L, 999L))            // orderkey 11 has no parent order
        .toDF("l_orderkey", "l_extendedprice")
        .select(col("l_orderkey"))
        .write.parquet(s"$base/lineitem.parquet")
      Seq(10L).toDF("o_orderkey").write.parquet(s"$base/orders.parquet")

      val rep = Expectations.dataExpectations(spark, base.toString)
        .collect().map(r => r.getString(0) -> r).toMap
      assert(rep.size === 7)
      rep.values.foreach(r => assert(!r.getAs[Boolean]("passed"),
        s"${r.getString(0)} should FAIL on the corrupted corpus: $r"))
      // observed values are the documented exact integers
      assert(rep("completeness").getAs[Long]("observed") === 5L * 1000000 / 6)
      assert(rep("uniqueness").getAs[Long]("observed") === 5L * 1000000 / 6)
      assert(rep("accepted_values").getAs[Long]("observed") === 5L * 1000000 / 6)
      assert(rep("consistency").getAs[Long]("observed") === 5L * 1000000 / 6)
      assert(rep("min_bound").getAs[Long]("observed") === 0L)
      assert(rep("max_bound").getAs[Long]("observed") === 3000L)
      assert(rep("referential_integrity").getAs[Long]("observed") === 1L)

      // and the clean graded corpus passes everything
      val clean = Expectations.dataExpectations(spark, sf0001).collect()
      assert(clean.length === 7)
      clean.foreach(r => assert(r.getAs[Boolean]("passed"), r.toString))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("t43 importer expectations: raw-feed checks bind, post-validation FK passes") {
    import graft.operators.Expectations
    val rep = Expectations.importerExpectations(spark, sf0001)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(rep.size === 5)
    // the fixture plants empty dimension_ids (%1300 rows) and empty
    // options (%900 rows): both completeness checks must FAIL and report
    // a fraction strictly below 1
    val dimId = rep("dimensions.dimension_id")
    assert(!dimId.getAs[Boolean]("passed") && dimId.getAs[Long]("observed") < 1000000L)
    val opt = rep("dimensions.option")
    assert(!opt.getAs[Boolean]("passed") && opt.getAs[Long]("observed") < 1000000L)
    // several lineitems of one order share a nation/brand: the raw feed is
    // naturally duplicated, so S9-uniqueness fails BEFORE A3 dedup
    val uniq = rep("dimensions.(instance_id, dimension_id, option)")
    assert(!uniq.getAs[Boolean]("passed") && uniq.getAs[Long]("observed") < 1000000L)
    // planted empty-instance_id events (%300 rows) trip event validation
    val ev = rep("events.instance_id")
    assert(!ev.getAs[Boolean]("passed") && ev.getAs[Long]("observed") < 1000000L)
    // the post-validation attach set resolves every code list: FK passes
    val fk = rep("dimensions.(code_list_id, option) -> code_lists")
    assert(fk.getAs[Boolean]("passed") && fk.getAs[Long]("observed") === 0L)
  }

  test("t42 embedding drift: steady-state passes, a planted encoder shift trips its label") {
    import graft.operators.Expectations
    import org.apache.spark.sql.functions.{col, expr}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // steady state: prefix half vs full is pure sampling noise — under cut
    val steady = Expectations.embeddingDriftFrames(
      emb, cutoff = 250L, Expectations.MaxCentroidShift2Fx2).collect()
    assert(steady.length === 10)
    steady.foreach(r => assert(!r.getAs[Boolean]("drifted"),
      s"noise tripped the cut: $r"))
    // plant a re-normalized encoder for label 3: every CURRENT-half (post-
    // cutoff) vector of that label moves +1.0 in every dim
    val planted = emb.withColumn("embedding",
      expr("""CASE WHEN label = 3 AND vec_id >= 250
             |  THEN transform(embedding, x -> x + cast(1.0 AS float))
             |  ELSE embedding END""".stripMargin))
    val got = Expectations.embeddingDriftFrames(
      planted, cutoff = 250L, Expectations.MaxCentroidShift2Fx2)
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Boolean]("drifted")).toMap
    assert(got(3), "the planted shift must trip label 3")
    assert(got.filter(_._1 != 3).values.forall(!_), s"only label 3 may trip: $got")

    // an empty snapshot (cutoff below every id — a fresh corpus) is drift
    // by definition, never an ANSI division error
    val fresh = Expectations.embeddingDriftFrames(
      emb, cutoff = -1L, Expectations.MaxCentroidShift2Fx2).collect()
    assert(fresh.length === 10)
    fresh.foreach { r =>
      assert(r.getAs[Boolean]("drifted") && r.isNullAt(r.fieldIndex("shift2_fx2")), r.toString)
    }
    val freshMetrics = Expectations.metricDrift(spark, sf0001, cutoff = -1L).collect()
    assert(freshMetrics.length === 4)
    freshMetrics.foreach(r => assert(r.getAs[Boolean]("drifted"), r.toString))
  }

  test("audio decode: real WAV fixtures through the mapPartitions codec path") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // deterministic in-test WAV fixtures via the JDK's own encoder
    def wav(channels: Int)(sample: (Long, Int) => Int): Array[Byte] = {
      val frames = 64L
      val pcm = new Array[Byte](frames.toInt * 2 * channels)
      for (f <- 0L until frames; c <- 0 until channels) {
        val s = sample(f, c)
        val off = (f.toInt * channels + c) * 2
        pcm(off) = (s & 0xFF).toByte
        pcm(off + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(8000f, 16, channels, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // square wave ±16384, 4-sample half-period: rms exactly half scale
    val square = wav(1)((f, _) => if ((f / 4) % 2 == 0) 16384 else -16384)
    val silence = wav(1)((_, _) => 0)
    // stereo: channel 0 carries the square, channel 1 silence — the
    // features must come from channel 0 only
    val stereo = wav(2)((f, c) => if (c == 0 && (f / 4) % 2 == 0) 16384
      else if (c == 0) -16384 else 0)
    val garbage = Array.tabulate[Byte](128)(i => (i * 13).toByte)

    val df = Seq((1L, square), (2L, silence), (3L, stereo), (4L, garbage))
      .toDF("doc_id", "payload")
    val got = MultimodalOps.audioFeatures(df).collect().map(f => f.doc_id -> f).toMap

    val sq = got(1L)
    assert(sq.decode_ok && sq.sample_rate === 8000 && sq.channels === 1)
    assert(sq.n_samples === 64L)
    assert(sq.rms_e4 === 5000L, s"square rms: ${sq.rms_e4}") // 16384/32768
    assert(sq.peak_abs === 16384)
    // 16 alternating 4-sample blocks → 15 sign flips
    assert(sq.zero_crossings === 15L, s"zc: ${sq.zero_crossings}")

    val si = got(2L)
    assert(si.decode_ok && si.rms_e4 === 0L && si.zero_crossings === 0L && si.peak_abs === 0)

    val st = got(3L)
    assert(st.decode_ok && st.channels === 2 && st.n_samples === 64L)
    assert(st.rms_e4 === 5000L && st.zero_crossings === 15L,
      s"stereo must read channel 0: rms=${st.rms_e4} zc=${st.zero_crossings}")

    assert(!got(4L).decode_ok && got(4L).n_samples === 0L)
  }

  test("t39 map-only codegen path is bit-equal to the exploded reference formulation") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, slice, split, when}
    // the planted frame exercises the dup rules too
    val seeded = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("text",
        when(col("doc_id") % 17 === 0,
          concat(col("text"), lit(" "),
            concat_ws(" ", slice(split(col("text"), " "), 1, 12))))
          .otherwise(col("text")))
    def image(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val fast = image(TextAnalysis.gopherSignals(seeded))
    val ref = image(TextAnalysis.gopherSignalsExploded(seeded))
    assert(fast === ref)
    // adversarial shapes the corpus lacks: empty tokens (double spaces),
    // single token, doc shorter than every dup order, exact 10-gram loop
    val weird = Seq(
      (1L, "a  b a  b a  b"),
      (2L, "solo"),
      (3L, "x y"),
      (4L, ("p q r s t u v w x y " * 3).trim))
      .toDF("doc_id", "text")
    assert(image(TextAnalysis.gopherSignals(weird)) ===
      image(TextAnalysis.gopherSignalsExploded(weird)))
    // and the fast path's plan is EXCHANGE-FREE — the point of the rewrite
    val plan = TextAnalysis.gopherSignals(seeded).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"t39 fast path gained a shuffle:\n$plan")
  }

  test("t39s stage twin: map-only path is bit-equal to the exploded per-n reference") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    def image(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // the exploded reference (two corpus shuffles) stays as the
    // independently-derived twin; the production stage query must match
    // it triple-for-triple on the graded seeded corpus...
    val fast = image(TextAnalysis.gopherRepetitionStage(spark, sf0001, plantRepetition = true))
    val ref = image(TextAnalysis.gopherRepetitionStagePerNRef(spark, sf0001)
      .select(col("doc_id"), col("n"),
        col("top_chars").cast("bigint").as("top_chars"),
        col("dup_chars").cast("bigint").as("dup_chars")))
    assert(fast.nonEmpty && fast === ref)
    // ...and carry ZERO n-gram exchanges — the stage diagnostic now costs
    // ~1× the map-only production query, not the exploded 5×
    val plan = TextAnalysis.gopherRepetitionStage(spark, sf0001, plantRepetition = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"t39s stage twin gained a shuffle:\n$plan")
  }

  test("t39 gopher rules: dup gates bind exactly on the planted docs, clean docs all-zero") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.gopherRepetition(spark, sf0001, plantRepetition = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val planted = got.keys.filter(_ % 17 == 0)
    val clean = got.keys.filterNot(_ % 17 == 0)
    assert(planted.nonEmpty && clean.nonEmpty)
    // re-appending the first 12 tokens duplicates every 5..10-gram inside
    // that run, so ALL planted docs carry nonzero dup fractions...
    planted.foreach { id =>
      (5 to 10).foreach { n =>
        assert(got(id).getAs[Long](s"dup${n}_frac_e6") > 0, s"doc $id dup$n")
      }
    }
    // ...and the word-soup corpus never repeats a 5-gram on its own
    clean.foreach { id =>
      (5 to 10).foreach { n =>
        assert(got(id).getAs[Long](s"dup${n}_frac_e6") === 0L, s"doc $id dup$n")
      }
    }
    // the composed gate is exactly the conjunction of the per-rule checks
    got.values.foreach { r =>
      val expect =
        TextAnalysis.GopherTopMaxE6.forall { case (n, m) =>
          r.getAs[Long](s"top${n}_frac_e6") <= m } &&
        TextAnalysis.GopherDupMaxE6.forall { case (n, m) =>
          r.getAs[Long](s"dup${n}_frac_e6") <= m }
      assert(r.getAs[Boolean]("gopher_keep") === expect)
    }
    // and it BINDS: at least one planted doc fails, no clean doc does on
    // the dup side alone
    assert(planted.exists(id => !got(id).getAs[Boolean]("gopher_keep")),
      "planted repetition never tripped the gate")
  }

  test("frame samples: one row per stride with the payload char at the offset") {
    import org.apache.spark.sql.functions._
    val frames = MultimodalOps.frameSamples(spark, sf0001)
      .as[(Long, Long, Long, String, Boolean)].collect()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val byDoc = frames.groupBy(_._1)
    assert(byDoc.keySet === texts.keySet)
    byDoc.foreach { case (id, fs) =>
      val t = texts(id)
      assert(fs.length === (t.length - 1) / 125 + 1)
      fs.foreach { case (_, idx, ts, ch, key) =>
        assert(ts === idx * 125)
        assert(ch === t.substring(idx.toInt * 125, idx.toInt * 125 + 1))
        assert(key === (idx % 8 == 0))
      }
    }
  }

  test("video container: strided seek decodes real PNG frames, corruption stays in-band") {
    import graft.operators.{FrameContainer, MMFrameFeatures}
    def png(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (shade << 16) | (shade << 8) | shade
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer missing")
      out.toByteArray
    }
    // 12 frames at 25ms; gray shade = 16*frame_idx, so the decoded
    // mean luminance names the frame it came from (gray luma is exact:
    // (77+150+29)*s >> 8 = s)
    val shades = (0 until 12).map(_ * 16)
    val goodFrames = shades.map(png)
    val good = FrameContainer.encode(goodFrames, frameMs = 25)
    // two of the three sampled frames (5 and 10) corrupted; frame 0 clean
    val partlyBad = FrameContainer.encode(
      goodFrames.updated(5, Array[Byte](1, 2, 3)).updated(10, Array[Byte](9)), 25)
    val notAContainer = Array.tabulate[Byte](32)(_.toByte)

    val df = Seq((1L, good), (2L, partlyBad), (3L, notAContainer))
      .toDF("doc_id", "payload")
    val got = MultimodalOps.videoFrameFeatures(df, sampleEveryMs = 125)
      .collect().groupBy(_.doc_id)

    // 125ms / 25ms = every 5th of 12 frames → indices 0, 5, 10
    val g = got(1L).sortBy(_.frame_idx)
    assert(g.map(_.frame_idx).toSeq === Seq(0, 5, 10))
    g.foreach { f =>
      assert(f.decode_ok && f.width === 4 && f.height === 4)
      assert(f.ts_ms === f.frame_idx.toLong * 25)
      assert(f.keyframe === (f.frame_idx % 8 == 0))
      // real decode: the luminance histogram mean equals the frame's shade
      assert(f.mean_lum_e4 === f.frame_idx.toLong * 16 * 10000,
        s"frame ${f.frame_idx}: ${f.mean_lum_e4}")
    }
    // per-frame in-band failure: sampled corrupt frame 10 fails alone
    val b = got(2L).sortBy(_.frame_idx)
    assert(b.map(f => f.frame_idx -> f.decode_ok).toSeq ===
      Seq(0 -> true, 5 -> false, 10 -> false))
    assert(b.filter(_.decode_ok).forall(_.width === 4))
    // unparseable container: one dead-letter row, not zero rows
    assert(got(3L).toSeq === Seq(MMFrameFeatures(
      3L, -1, 0L, keyframe = false, decode_ok = false, 0, 0, 0L)))
    // seek is index-backed: frameAt returns exactly the encoded bytes
    assert(FrameContainer.frameAt(good, 7).get.toSeq === goodFrames(7).toSeq)
    assert(FrameContainer.frameAt(good, 12).isEmpty)
    // truncated container: header parses but payload range check catches it
    assert(FrameContainer.frameAt(good.take(good.length - 4), 11).isEmpty)
    // crafted index entry with offset near Long.MaxValue: `off + len`
    // would wrap negative and slip past a naive bounds check — the
    // overflow-safe form must return None, not throw from arraycopy
    val crafted = {
      val buf = java.nio.ByteBuffer.allocate(12 + 12)
      buf.putInt(0x47464331).putInt(40).putInt(1)
      buf.putLong(Long.MaxValue - 2).putInt(100)
      buf.array()
    }
    assert(FrameContainer.frameAt(crafted, 0).isEmpty)
  }

  test("frame container: seeded-random round-trip and truncation safety") {
    import graft.operators.FrameContainer
    // deterministic seeded sweep (the FunctionsSpec convention): arbitrary
    // frame counts and sizes — including empty frames and an empty
    // container — must round-trip exactly, and any truncation must come
    // back None from the range check, never an exception
    val rnd = new scala.util.Random(0x6F11)
    for (_ <- 1 to 200) {
      val frames = Vector.fill(rnd.nextInt(12)) {
        Array.fill[Byte](rnd.nextInt(50))(rnd.nextInt().toByte)
      }
      val ms = 1 + rnd.nextInt(200)
      val c = FrameContainer.encode(frames, ms)
      assert(FrameContainer.header(c) === Some((ms, frames.length)))
      frames.indices.foreach { i =>
        assert(FrameContainer.frameAt(c, i).get.toSeq === frames(i).toSeq, s"frame $i")
      }
      assert(FrameContainer.frameAt(c, frames.length).isEmpty)
      assert(FrameContainer.frameAt(c, -1).isEmpty)
      if (c.length > 1) {
        val cut = rnd.nextInt(c.length - 1) + 1
        val t = c.take(c.length - cut)
        // header may survive a payload-only cut; every frame read must
        // either return the exact original bytes or None — never garbage
        frames.indices.foreach { i =>
          FrameContainer.frameAt(t, i).foreach { f =>
            assert(f.toSeq === frames(i).toSeq, s"truncated read garbage at $i")
          }
        }
      }
    }
  }

  test("decontamination n-gram size is configurable and counts shrink as n grows") {
    import graft.operators.TrainingPrep
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("contam").toString
    // eval doc 0 shares exactly one run of 6 consecutive tokens with train
    // doc 100; all other tokens are disjoint between the two
    val run = (1 to 6).map(i => s"c$i").mkString(" ")
    val evalText = (1 to 5).map(i => s"e$i").mkString(" ") + s" $run " +
      (6 to 10).map(i => s"e$i").mkString(" ")
    val trainText = (1 to 8).map(i => s"t$i").mkString(" ") + s" $run " +
      (9 to 16).map(i => s"t$i").mkString(" ")
    Seq(
      (0L, evalText, "en", "s", evalText.length.toLong),
      (100L, trainText, "en", "s", trainText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def sharedAt(n: Int): Long =
      TrainingPrep.contamination(spark, dir, n = n, minShared = 1L)
        .filter(col("doc_id") === 0L).select("n_shared").as[Long].head()
    // a 6-token run yields 6-n+1 shared n-grams, and none once n exceeds it
    assert(sharedAt(3) === 4L)
    assert(sharedAt(6) === 1L)
    assert(sharedAt(7) === 0L)
    assert(TrainingPrep.contamination(spark, dir, n = 7, minShared = 1L)
      .filter(col("doc_id") === 0L).select("contaminated").as[Boolean].head() === false)
  }

  test("repetition signals separate looping text from varied text") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    val looping = Array.fill(30)("spam ham").mkString(" ")     // one dominant bigram
    val varied = (1 to 60).map(i => s"w$i").mkString(" ")      // all n-grams unique
    Seq((1L, looping, "en", "s", looping.length.toLong),
        (2L, varied, "en", "s", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.repetitionSignals(spark, dir)
      .select("doc_id", "top_bigram_share_e6", "dup_trigram_frac_e6")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> (a, b) }.toMap
    // looping doc: "spam ham" appears 30 of 59 bigrams; trigrams cycle with
    // period 2 → only 2 distinct among 58
    assert(got(1L)._1 === math.round(30 * 1e6 / 59))
    assert(got(1L)._2 === math.round((58 - 2) * 1e6 / 58))
    // varied doc: every bigram unique (share = 1/59), no duplicate trigrams
    assert(got(2L)._1 === math.round(1e6 / 59))
    assert(got(2L)._2 === 0L)
  }

  test("pii redaction: planting off is identity on a clean corpus; planted PII is scrubbed") {
    import graft.operators.TextAnalysis
    val clean = TextAnalysis.piiRedacted(spark, sf0001)
      .filter($"n_emails" > 0 || $"n_phones" > 0 || $"redacted".contains("<"))
    assert(clean.count() === 0, "clean corpus must redact nothing by default")
    val planted = TextAnalysis.piiRedacted(spark, sf0001, plantPii = true)
      .filter($"doc_id" % 20 === 0)
      .select("n_emails", "n_phones", "redacted")
      .as[(Int, Int, String)].collect()
    assert(planted.nonEmpty)
    planted.foreach { case (e, p, r) =>
      assert(e === 1 && p === 1)
      assert(r.endsWith(" contact <EMAIL> now call <PHONE>"))
      assert(!r.contains("@") && !r.contains("555-"))
    }
  }

  test("t49: extraction recovers the planted body exactly on every page") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.htmlExtracted(spark, sf0001).cache()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(out.count() === docs.count())
    // the fidelity bit: boilerplate out, content (incl. the unescaped
    // entity) byte-for-byte intact — for EVERY page shape in the plant
    assert(out.filter(!$"round_trip").count() === 0)
    // boilerplate really was dropped: retention strictly below 1
    assert(out.filter($"retention_e4" >= 10000L).count() === 0)
    assert(out.filter($"n_text_chars" >= $"n_raw_chars").count() === 0)
    out.unpersist()
  }

  test("t49: the extraction chain is map-only — no exchange in the plan") {
    import graft.operators.TextAnalysis
    val plan = TextAnalysis.htmlExtracted(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected an exchange-free plan:\n$plan")
  }

  test("t54: C4 policy flags match an independent JVM rule replay; map-only plan") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.c4PolicyFilters(spark, sf0001).cache()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.count() === docs.size.toLong)
    val rows = out.collect()
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val toks = text.split(" ")
      assert(r.getAs[Boolean]("has_bad_word") === toks.contains("dup"))
      assert(r.getAs[Boolean]("too_short") === (toks.length < 25))
      // rules whose trigger the corpus can't contain still report (false)
      assert(!r.getAs[Boolean]("has_brace"))
      assert(!r.getAs[Boolean]("has_lorem"))
      assert(!r.getAs[Boolean]("has_js"))
      assert(r.getAs[Boolean]("kept") ===
        !(r.getAs[Boolean]("has_bad_word") || r.getAs[Boolean]("too_short")))
    }
    // both live rules fire somewhere, and most of the corpus survives
    assert(rows.count(_.getAs[Boolean]("has_bad_word")) > 0)
    assert(rows.count(_.getAs[Boolean]("too_short")) > 0)
    assert(rows.count(_.getAs[Boolean]("kept")) > rows.length / 2)
    out.unpersist()
    val plan = TextAnalysis.c4PolicyFilters(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected an exchange-free plan:\n$plan")
  }

  test("t47: per-language fertility equals a JVM replay; one lang-bounded aggregate") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.tokenizerFertilityByLang(spark, sf0001)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("ws_tokens"),
          r.getAs[Long]("bpe_pieces"), r.getAs[Long]("fertility_e4"),
          r.getAs[Long]("chars_per_piece_e4"))))
      .toMap
    // independent replay: java.util.regex over the collected corpus
    val re = java.util.regex.Pattern.compile("( ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+)")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "text").as[(String, String)].collect()
    def pieces(t: String): Long = {
      val m = re.matcher(t); var n = 0L; while (m.find()) n += 1; n
    }
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val ws = rows.map(_._2.count(_ == ' ').toLong + 1).sum
      val pc = rows.map(r => pieces(r._2)).sum
      val ch = rows.map(_._2.length.toLong).sum
      def e4(x: Double) = math.floor(x * 10000.0 + 0.5).toLong
      lang -> ((rows.length.toLong, ws, pc, e4(pc.toDouble / ws), e4(ch.toDouble / pc)))
    }
    assert(out === expected, "t47 diverged from the JVM replay")
    assert(out.size > 1, "fertility table needs multiple languages to be a signal")
    // plan: map-only projection + ONE partial-aggregated exchange
    val plan = TextAnalysis.tokenizerFertilityByLang(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("m8: media quality gate flags match a JVM rule replay; every rule fires; map-only plan") {
    import graft.operators.MultimodalOps
    val out = MultimodalOps.mediaQualityGate(spark, sf0001).collect()
    val chars = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(out.length === chars.size)
    out.foreach { r =>
      val n = chars(r.getAs[Long]("doc_id"))
      val w = (n % 64 + 1).toInt; val h = (n / 64 + 1).toInt
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      assert(r.getAs[Long]("n_bytes") === n)
      assert(r.getAs[Boolean]("too_narrow") === (w < 8))
      assert(r.getAs[Boolean]("too_flat") === (h < 2))
      assert(r.getAs[Boolean]("bad_aspect") === (w > 16 * h))
      assert(r.getAs[Boolean]("too_few_bytes") === (n < 100))
      // the ASCII fixture's payload always matches its declared size —
      // the rule exists for real (truncated) media, must never fire here
      assert(!r.getAs[Boolean]("size_mismatch"))
      assert(r.getAs[Boolean]("kept") ===
        !(w < 8 || h < 2 || w > 16 * h || n < 100))
    }
    // every live rule fires somewhere and most assets survive
    assert(out.count(_.getAs[Boolean]("too_narrow")) > 0)
    assert(out.count(_.getAs[Boolean]("too_flat")) > 0)
    assert(out.count(_.getAs[Boolean]("bad_aspect")) > 0)
    assert(out.count(_.getAs[Boolean]("too_few_bytes")) > 0)
    assert(out.count(_.getAs[Boolean]("kept")) > out.length / 2)
    val plan = MultimodalOps.mediaQualityGate(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected an exchange-free plan:\n$plan")
  }

  test("m7: relational fingerprint ≡ scalar JVM twin on every corpus payload") {
    import graft.operators.MultimodalOps
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = MultimodalOps.phashOf(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.collect()
      .map(r => r.getLong(0) -> MultimodalOps.phashBytes(r.getString(1).getBytes("UTF-8")))
      .toMap
    assert(got === expected)
  }

  test("m7: exact copies always collapse; one-byte perturbations mostly survive") {
    import graft.operators.MultimodalOps
    val groups = MultimodalOps.phashDupGroups(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every byte-identical plant (ids < PhashExactCopies) forms a group
    val exact = groups.count(_._3 < MultimodalOps.PhashExactCopies)
    assert(exact.toLong === MultimodalOps.PhashExactCopies,
      s"expected all ${MultimodalOps.PhashExactCopies} exact plants grouped, got $exact")
    // the perceptual property: a single changed byte moves one segment's
    // mean by ≤1/len, so most perturbed plants keep their fingerprint
    val perturbed = groups.count(g =>
      g._3 >= MultimodalOps.PhashExactCopies &&
        g._3 < MultimodalOps.PhashPerturbedCopies)
    val planted =
      MultimodalOps.PhashPerturbedCopies - MultimodalOps.PhashExactCopies
    assert(perturbed * 2 > planted,
      s"only $perturbed of $planted perturbed plants kept their fingerprint")
  }

  test("m7: real-codec fingerprints via ImageIO luminance distinguish structure") {
    import graft.operators.MultimodalOps
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer missing")
      out.toByteArray
    }
    def fp(bytes: Array[Byte]): String =
      MultimodalOps.phashBytes(MultimodalOps.lumaBytes(bytes).get)
    val grad = png(64, 2)((x, _) => { val v = x * 4; (v << 16) | (v << 8) | v })
    val gradAgain = png(64, 2)((x, _) => { val v = x * 4; (v << 16) | (v << 8) | v })
    val inverse = png(64, 2)((x, _) => { val v = 252 - x * 4; (v << 16) | (v << 8) | v })
    // re-encoding the same structure reproduces the fingerprint...
    assert(fp(grad) === fp(gradAgain))
    // ...and opposite structure flips it
    assert(fp(grad) !== fp(inverse))
    // undecodable bytes stay in-band
    assert(MultimodalOps.lumaBytes(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("multimodal meta formulas and payload byte length") {
    val m = MultimodalOps.assetMeta(spark, sf0001)
      .as[(Long, String, Int, Int, Long)].collect()
    assert(m.nonEmpty)
    m.take(20).foreach { case (_, fmt, w, h, nb) =>
      assert(fmt === "fake/rgb8")
      assert(w === (nb % 64 + 1))
      assert(h === (nb / 64 + 1))
    }
  }

  test("resize downsamples payload and dimensions by the same integer factor") {
    import graft.operators.MultimodalOps
    val meta = MultimodalOps.assetMeta(spark, sf0001)
      .select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    val rs = MultimodalOps.resizedAssets(spark, sf0001)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
    assert(rs.length === meta.size)
    rs.foreach { case (id, factor, w, h, nBytes, _) =>
      assert(factor >= 1)
      assert(w <= 16 && h <= 16, s"doc $id resized to ${w}x$h > maxDim")
      assert(nBytes === (meta(id) + factor - 1) / factor,
        s"doc $id kept $nBytes of ${meta(id)} bytes at factor $factor")
    }
  }

  test("stubbed decode is deterministic and unit-norm") {
    val a = MultimodalOps.decodeFeatures(spark, sf0001).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeFeatures(spark, sf0001).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    a.take(20).foreach { f =>
      assert(f.feat_norm_e4 === 10000L) // histogram normalized to unit L2
      assert(f.n_frames === (f.n_bytes + 31) / 32)
      assert(f.feat.length === 16 && math.abs(f.feat.map(x => x * x).sum - 1f) < 1e-3f)
      assert(f.mean_byte_e4 > 32 * 10000L && f.mean_byte_e4 < 127 * 10000L) // printable ASCII
    }
  }

  test("multimodal feature top-k: every query retrieves itself at cosine 1.0") {
    val rows = graft.operators.MultimodalOps.featureTopK(spark, sf0001)
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.length === 8 * 5)
    (0L until 8L).foreach { q =>
      val self = rows.find(r => r._1 == q && r._2 == q)
      assert(self.isDefined, s"query $q does not retrieve itself in its top-5")
      assert(self.get._3 === 10000L)
    }
  }

  test("training selection composes its gates and each gate rejects something") {
    import graft.operators.TrainingPrep
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val sel = TrainingPrep.trainingSelection(spark, sf0001).cache()
    val kept = sel.count()
    assert(kept > 0 && kept < total, s"selection must be a proper subset: $kept/$total")
    // every surviving row satisfies every gate
    assert(sel.filter(
      $"quality_e4" < TrainingPrep.MinQualityE4 ||
        $"n_tokens" < TrainingPrep.MinTokens || $"n_tokens" > TrainingPrep.MaxTokens ||
        $"dup_frac_e4" > TrainingPrep.MaxDupFracE4).count() === 0L)
    // and each gate individually rejects at least one document on this
    // corpus (otherwise the composition silently degrades to fewer gates)
    val toks = graft.operators.TextAnalysis.tokenStats(spark, sf0001)
    val qual = graft.operators.TextAnalysis.qualityScores(spark, sf0001)
    val dup = graft.operators.Dedup.duplicatedSegments(spark, sf0001)
    assert(qual.filter($"quality_e4" < TrainingPrep.MinQualityE4).count() > 0)
    assert(toks.filter($"n_tokens" < TrainingPrep.MinTokens).count() > 0)
    assert(dup.filter($"dup_frac_e4" > TrainingPrep.MaxDupFracE4).count() > 0)
    sel.unpersist()
  }

  test("t25 scrub-then-select: scrubbed survivors present, planted ids absent") {
    import graft.operators.{Dedup, TrainingPrep}
    val sel = TrainingPrep.trainingSelectionScrubbed(spark, sf0001).cache()
    // the composition must be OBSERVABLE: at least one selected doc had a
    // duplicated span removed and was re-gated on its cleaned text (if
    // this goes to zero the query degrades to t23 with extra steps)
    val scrubbed = sel.filter($"n_dropped_tokens" > 0)
      .select("doc_id", "n_dropped_tokens").as[(Long, Long)].collect()
    assert(scrubbed.nonEmpty, "no selected row carries a scrubbed span")
    // every scrubbed survivor lost whole segments (the planted-head shape)
    scrubbed.foreach { case (id, nd) =>
      assert(nd % Dedup.SegmentTokens === 0, s"doc $id dropped $nd tokens")
    }
    // the planted copy ids are fixture scaffolding, never selectable
    assert(sel.filter($"doc_id" >= Dedup.PartialCopyOffset).count() === 0L)
    // re-gating really uses the CLEANED text: every survivor's n_tokens
    // is the clean_text token count, not the raw one
    val bad = sel.filter(
      graft.operators.TextAnalysis.nTokensCol($"clean_text") =!= $"n_tokens")
    assert(bad.count() === 0L, "n_tokens not derived from clean_text")
    sel.unpersist()
  }
}
