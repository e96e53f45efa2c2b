package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** t50 BPE vocabulary induction: hand-computed merge trace, apply-time
  * segmentation, and the corpus-level fertility contract. Cross-engine
  * values are pinned by the DuckDB oracle via Verify; these tests pin
  * the algorithm itself.
  */
class BpeSpec extends SparkSuite {

  test("t50: merge training follows the (count desc, pair asc) rule with recounts") {
    // hist: aaab ×3, ab ×2 → symbol tapes (a a a b </w>)×3, (a b </w>)×2
    val hist = Seq(("aaab", 3L), ("ab", 2L))
    val merges = Bpe.trainMerges(hist, 3)
    // iter0: (a,a)=6 (all-adjacent: "aaa" counts twice per word), beats
    //        (a,b)=5 and (b,</w>)=5
    // iter1: after a+a→aa the recount gives (a,b)=5 tying (b,</w>)=5 —
    //        pair-asc tie-break picks (a,b)
    // iter2: (ab,</w>)=5 beats (aa,ab)=3
    assert(merges === Seq(
      (0, "a", "a", 6L),
      (1, "a", "b", 5L),
      (2, "ab", Bpe.EndMark, 5L)))
    // apply-time segmentation in rank order: aaab → [aa, ab</w>]
    assert(Bpe.pieceCount("aaab", merges) === 2)
    // ab → [ab</w>] — fully merged to one piece
    assert(Bpe.pieceCount("ab", merges) === 1)
    // unseen symbols never merge: pieces = chars + end mark
    assert(Bpe.pieceCount("xyz", merges) === 4)
  }

  test("t50: training is a pure function of the histogram (order-insensitive)") {
    val hist = Seq(("batch", 9L), ("scan", 7L), ("join", 7L), ("row", 2L))
    assert(Bpe.trainMerges(hist, 8) === Bpe.trainMerges(hist.reverse, 8))
  }

  test("t52: vocab-histogram occurrence mass equals the t50 per-doc piece mass") {
    val vocab = Bpe.bpeVocabHistogram(spark, sf0001)
      .agg(sum(col("n_occurrences"))).collect()(0).getLong(0)
    val perDoc = Bpe.bpePieceStats(spark, sf0001)
      .agg(sum(col("n_pieces"))).collect()(0).getLong(0)
    // the same segmentation counted two ways — piece-major vs doc-major
    assert(vocab === perDoc)
    // the end-mark piece family must cover every word occurrence exactly
    // once: pieces ENDING in </w> sum to the corpus word count
    val endMass = Bpe.bpeVocabHistogram(spark, sf0001)
      .filter(col("piece").endsWith(Bpe.EndMark))
      .agg(sum(col("n_occurrences"))).collect()(0).getLong(0)
    val nWords = spark.read.parquet(s"$sf0001/documents.parquet")
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(endMass === nWords)
  }

  test("t50: corpus fertility stats are bounded and cover every document") {
    val out = Bpe.bpePieceStats(spark, sf0001).cache()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(out.count() === docs.count())
    // each word segments to between 1 piece and chars+1 pieces, so the
    // per-doc average (e4) must sit in [1, max-word-len + 1] · 1e4
    assert(out.filter(col("pieces_per_word_e4") < 10000L).count() === 0)
    val maxLen = docs
      .select(max(array_max(transform(split(col("text"), " "), w => length(w)))))
      .collect()(0).getInt(0)
    assert(out.filter(
      col("pieces_per_word_e4") > (maxLen + 1).toLong * 10000L).count() === 0)
    // 16 merges on a 31-word vocab must bind somewhere: corpus-total
    // pieces strictly below the untrained ceiling (chars-of-words +
    // one end mark per word = n_chars + 1 for a space-separated doc)
    val totals = out.join(docs.select(col("doc_id"), length(col("text")).as("nc")), "doc_id")
      .agg(sum(col("n_pieces")).as("p"), sum(col("nc") + 1).as("ceiling"))
      .collect()(0)
    assert(totals.getLong(0) < totals.getLong(1),
      s"merges had no effect: ${totals.getLong(0)} !< ${totals.getLong(1)}")
    out.unpersist()
  }
}
