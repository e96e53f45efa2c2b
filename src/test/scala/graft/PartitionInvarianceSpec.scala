package graft

import org.apache.spark.sql.DataFrame

/** Pins the determinism contract round 9's driver flake exposed on
  * t30_curriculum_selection: the distributed prefix-sum family
  * (t11 packedChunks, t26 shardAssignment, t27 shardManifest,
  * t30 curriculumSelection) must produce BIT-IDENTICAL output regardless of
  *
  *   - physical parallelism (`spark.sql.shuffle.partitions` 1 vs 7 vs the
  *     suite default),
  *   - exchange reuse (`spark.sql.exchange.reuse=false` forces every plan
  *     branch to re-execute its exchange — the exact condition under which
  *     a `spark_partition_id()` stamp after a sampled range exchange can
  *     disagree between branches), and
  *   - AQE on/off (runtime re-planning must not re-sample anything the
  *     result depends on).
  *
  * The implementation guarantees this by construction — bucket ids are
  * pure functions of the data (doc_id range / md5 prefix / quality band),
  * never physical partition ids — and this suite is the regression tripwire
  * for anyone reintroducing a physical-position dependence. Reference
  * semantic: the importer's deterministic ordering discipline in
  * dp-dimension-importer handler/incoming_instance_handler.go (results are
  * functions of message content, never of delivery concurrency).
  */
class PartitionInvarianceSpec extends SparkSuite {

  private val ops: Seq[(String, () => DataFrame)] = Seq(
    "t11_packed_chunks" ->
      (() => graft.operators.TrainingPrep.packedChunks(spark, sf0001)),
    "t26_shard_assignment" ->
      (() => graft.operators.TrainingPrep.shardAssignment(spark, sf0001)),
    "t27_shard_manifest" ->
      (() => graft.operators.TrainingPrep.shardManifest(spark, sf0001)),
    "t30_curriculum_selection" ->
      (() => graft.operators.TrainingPrep.curriculumSelection(spark, sf0001)),
    // the pareto-lottery keep rule must be a pure function of the row
    // (md5 draw + trained-frame threshold), never of physical placement
    "t48_quality_classifier_keep" ->
      (() => graft.operators.LmScore.qualityClassifierKeep(spark, sf0001)))

  /** Canonical row-set image: column-name-sorted, row-sorted, exact string
    * rendering — the same shape the driver hashes, so equality here means
    * hash-equality there.
    */
  private def image(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .toSeq
      .sorted
  }

  private def withConfs(confs: (String, String)*)(body: => Seq[String]): Seq[String] = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val settings: Seq[(String, Seq[(String, String)])] = Seq(
    "reuse-off aqe-on" -> Seq(
      "spark.sql.exchange.reuse" -> "false",
      "spark.sql.adaptive.enabled" -> "true"),
    "reuse-off aqe-off" -> Seq(
      "spark.sql.exchange.reuse" -> "false",
      "spark.sql.adaptive.enabled" -> "false"),
    "parts-1" -> Seq("spark.sql.shuffle.partitions" -> "1"),
    "parts-7 reuse-off" -> Seq(
      "spark.sql.shuffle.partitions" -> "7",
      "spark.sql.exchange.reuse" -> "false"))

  for ((name, op) <- ops) {
    test(s"$name is bit-identical under exchange-reuse-off, AQE on/off, partitions 1/7") {
      val baseline = image(op())
      assert(baseline.nonEmpty, s"$name returned no rows at sf0.001")
      for ((label, confs) <- settings) {
        val got = withConfs(confs: _*)(image(op()))
        assert(got == baseline,
          s"$name diverged under [$label]: ${got.size} rows vs ${baseline.size}; " +
            s"first diff: ${got.zipAll(baseline, "<missing>", "<missing>")
              .find { case (a, b) => a != b }}")
      }
    }
  }
}
