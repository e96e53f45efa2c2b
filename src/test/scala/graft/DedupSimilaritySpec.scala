package graft

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
      .as[(Long, Long, Double)].collect().toSet
    assert(jac === Set((1L, 2L, 1.0)))

    val mh = Dedup.minhashLshPairs(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(mh === Set((1L, 2L, 1.0)))

    val sp = Dedup.simhashPairs(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(sp === Set((1L, 2L)))
  }

  test("minhash LSH candidates reproduce full jaccard pairs on sf0.001") {
    val exact = Dedup.ngramJaccardPairs(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    // LSH candidates are a subset-with-high-recall of the exact pairs;
    // everything LSH verifies must appear in the exact set.
    assert(lsh.subsetOf(exact))
    // recall on this corpus (pairs here are mostly exact dups, sim=1) is total
    assert(lsh === exact)
  }

  test("brute-force topk: every query's rank-1 neighbor is itself") {
    val top = Similarity.bruteForceTopK(spark, sf0001)
      .filter("rn = 1")
      .select("qid", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(top.length === 8)
    top.foreach { case (q, v, c) => assert(q === v && c === 1.0) }
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

  test("lsh buckets are deterministic across runs") {
    val a = Similarity.lshBuckets(spark, sf0001)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Similarity.lshBuckets(spark, sf0001)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }
}
