package graft

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

  test("stubbed decode is deterministic and unit-norm") {
    val a = MultimodalOps.decodeFeatures(spark, sf0001).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeFeatures(spark, sf0001).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    a.take(20).foreach { f =>
      assert(f.feat_norm === 1.0) // histogram normalized to unit L2
      assert(f.n_frames === (f.n_bytes + 31) / 32)
      assert(f.mean_byte > 32 && f.mean_byte < 127) // printable ASCII corpus
    }
  }
}
