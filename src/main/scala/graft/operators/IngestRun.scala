package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Per-checkpoint run identity for streaming index ingest.
  *
  * The replay markers [[ShingleIndex.ingestBatch]] / [[VectorIndex.ingestBatch]]
  * write are keyed by micro-batch id, but batch ids are only unique WITHIN
  * one checkpoint lineage: restarting a stream with a fresh checkpoint
  * restarts them at 0, while the markers (which live next to the index, not
  * inside the checkpoint) survive. A stale `batch-0.done` would then make
  * the guard silently drop every new batch whose id collides — the exact
  * silent-missing-rows failure the guard exists to prevent.
  *
  * The fix is to namespace the markers by a run id whose lifetime IS the
  * checkpoint's: a `_graft_run_id` file created inside the checkpoint
  * directory on first use. Resuming from the same checkpoint finds the file
  * and lands in the same namespace (so genuine redeliveries are still
  * caught); a fresh checkpoint — a new directory, or the old one deleted
  * and recreated — mints a new id and a clean namespace.
  */
private[graft] object IngestRun {

  /** The run id for `checkpoint`, minting and persisting one on first use. */
  private[graft] def runId(spark: SparkSession, checkpoint: String): String = {
    val p = new Path(s"$checkpoint/_graft_run_id")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      fs.mkdirs(p.getParent)
      try {
        // overwrite = false: if two writers race (two streams misconfigured
        // onto one checkpoint), exactly one create wins and both read it back
        val out = fs.create(p, false)
        out.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
        out.close()
      } catch { case _: java.io.IOException => () }
    }
    val in = fs.open(p)
    val bytes = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64)
    var n = in.read(buf)
    while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
    in.close()
    val id = bytes.toString("UTF-8").trim
    require(id.nonEmpty, s"empty run id file at $p")
    id
  }
}
