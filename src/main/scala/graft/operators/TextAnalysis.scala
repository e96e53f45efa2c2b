package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures.table

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Every metric is defined as an arithmetic formula over string primitives
  * that exists identically in Spark and DuckDB (`length`/`replace`/CASE),
  * so the DuckDB oracle reproduces results exactly — no engine-specific
  * tokenizers or hashes in the compared outputs.
  *
  * All operators are single-pass, shuffle-free projections: at 100 TB they
  * run as a map-only stage at scan speed, inside whole-stage codegen.
  */
object TextAnalysis {

  /** Count non-overlapping occurrences of `marker` via the replace trick —
    * (len(s) - len(replace(s, marker, ''))) / len(marker). Same left-to-right
    * non-overlapping semantics in Spark and DuckDB.
    */
  private def occurrences(s: Column, marker: String): Column =
    ((length(s) - length(replace(s, lit(marker), lit("")))) / lit(marker.length)).cast("int")

  /** Whitespace token statistics. Documents are single-space separated
    * (verified against the corpus), so token count = space count + 1.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val nTokens = (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1)
      .cast("bigint")
    d.select(
      col("doc_id"),
      col("n_chars"),
      nTokens.as("n_tokens"),
      Exact.e((col("n_chars") - (nTokens - 1)).cast("double") / nTokens, 4).as("avg_token_len_e4"))
  }

  /** Heuristic quality scoring: length signal + stopword-rate signal.
    * The score formula is the spec; both engines compute it bit-identically.
    */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val padded = concat(lit(" "), col("text"), lit(" "))
    val nTokens = (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1)
      .cast("double")
    val stopHits = (occurrences(padded, " the ") + occurrences(padded, " a ") +
      occurrences(padded, " and ") + occurrences(padded, " of ")).cast("double")
    d.select(
      col("doc_id"),
      (col("n_chars") < 100).as("is_short"),
      Exact.e(stopHits / nTokens, 4).as("stop_ratio_e4"),
      Exact.e(
        least(nTokens / lit(400.0), lit(1.0)) * lit(0.5) +
          least(stopHits / nTokens * lit(5.0), lit(1.0)) * lit(0.5),
        4).as("quality_e4"))
  }

  /** N-gram marker language-ID heuristic: score each language by its
    * function-word rate, argmax with a fixed tie-break order. (On this
    * synthetic corpus most documents score as English — the operator's
    * contract is the scoring formula, which the oracle replays.)
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val p = concat(lit(" "), col("text"), lit(" "))
    val sEn = occurrences(p, " the ") + occurrences(p, " a ")
    val sEs = occurrences(p, " el ") + occurrences(p, " la ")
    val sDe = occurrences(p, " der ") + occurrences(p, " und ")
    val sFr = occurrences(p, " le ") + occurrences(p, " et ")
    val pred = when(sEn >= sEs && sEn >= sDe && sEn >= sFr, lit("en"))
      .when(sEs >= sDe && sEs >= sFr, lit("es"))
      .when(sDe >= sFr, lit("de"))
      .otherwise(lit("fr"))
    d.select(
      col("doc_id"),
      col("lang"),
      pred.as("lang_pred"),
      (pred === col("lang")).as("agrees"))
  }

  /** Content fingerprints: full-document and head-64-chars MD5 (hex), the
    * exact-dedup keys. MD5 of UTF-8 bytes is identical across engines.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("md5_full"),
      md5(substring(col("text"), 1, 64).cast("binary")).as("md5_head"))

  /** Winnowing rolling-hash fingerprints (custom codegen expression): the
    * local-similarity sketch — shared substrings of length ≥ w+k-1 always
    * share a fingerprint entry. Output is a compact digest per document.
    */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(
      col("doc_id"),
      graft.functions.Winnowing.winnow(col("text")).as("fp"))
      .select(
        col("doc_id"),
        size(col("fp")).as("fp_len"),
        // order-independent digest of the fingerprint set
        xxhash64(concat_ws(",", transform(col("fp"), x => x.cast("string")))).as("fp_hash"))

  /** Winnowing-based near-dup candidates: invert the fingerprint index and
    * keep pairs sharing a high FRACTION of the smaller fingerprint set —
    * same inverted-index shape as the shingle pipeline, over the compressed
    * sketch (|fp| << |k-grams|). An absolute shared-count threshold is
    * useless on a small-vocabulary corpus (every doc pair shares some
    * hashes) and would explode the candidate set; the fraction filter keeps
    * only true containment/near-dup relationships.
    */
  def winnowCandidates(
      spark: SparkSession, dir: String,
      minOverlap: Double = 0.8,
      maxDocFreq: Int = 256): DataFrame = {
    val raw = table(spark, dir, "documents")
      .select(
        col("doc_id"),
        explode(array_distinct(graft.functions.Winnowing.winnow(col("text")))).as("h"))
    // posting-list pairing (one shuffle on the hash); the list-size filter
    // is the skew guard — a hash present in hundreds of documents carries
    // no near-dup signal but costs O(df²) candidate pairs
    val postings = raw
      .groupBy(col("h"))
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) <= maxDocFreq)
      .cache()
    val sizes = postings.select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = postings
      .select(explode(expr(graft.operators.Dedup.OrderedPairsExpr)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("shared"))
    val frac = col("shared").cast("double") / least(col("sa.n"), col("sb.n")).cast("double")
    shared
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .filter(frac >= minOverlap)
      .select(col("a"), col("b"), col("shared"), Exact.e(frac, 4).as("overlap_e4"))
  }
}
