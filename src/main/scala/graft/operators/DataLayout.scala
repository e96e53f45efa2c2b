package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Physical data-layout operators — the write-side half of scan
  * performance at 100 TB, where how bytes land on disk decides how many
  * of them every later query has to read.
  *
  *  - [[writeRangeClustered]]: range-partition + sort by a clustering key
  *    before writing, so parquet row-group min/max stats align with the
  *    key and a selective predicate skips whole row groups/files. The
  *    single-column cousin of Z-ordering: one sorted dimension, zero
  *    extra write cost beyond the range exchange.
  *  - [[compact]]: bounded-size file rewrite. Streaming appends and
  *    per-batch jobs leave thousands of KB-sized files; object-store
  *    listing and task scheduling are per-file costs, so periodic
  *    compaction to a target file size is standard pipeline hygiene.
  */
object DataLayout {

  /** Write `df` clustered by `key` into ~`numFiles` files: a range
    * exchange gives disjoint key ranges per file, the within-partition
    * sort gives monotone pages inside each, and parquet's footer stats
    * then make `key`-selective scans skip everything else.
    */
  def writeRangeClustered(
      df: DataFrame, key: Column, numFiles: Int, path: String): Unit =
    df.repartitionByRange(numFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Rewrite `inPath` with at most `targetRecordsPerFile` rows per file:
    * a sizing count, then a NARROW coalesce write — no shuffle, each
    * write task merges whole input files. Coalesced tasks can be uneven
    * (they inherit input-partition grouping), so `maxRecordsPerFile` is
    * the hard per-file bound and the coalesce target only steers the
    * file count near rows/target.
    */
  def compact(
      spark: SparkSession, inPath: String, outPath: String,
      targetRecordsPerFile: Long): Unit = {
    require(targetRecordsPerFile > 0,
      s"targetRecordsPerFile must be positive, got $targetRecordsPerFile")
    val in = spark.read.parquet(inPath)
    val rows = in.count()
    val parts = math.min(Int.MaxValue.toLong,
      math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)).toInt
    in.coalesce(parts)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(outPath)
  }
}
