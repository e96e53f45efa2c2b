package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sweeps EVERY registered query's plan for scale red flags —
  * CartesianProduct / BroadcastNestedLoopJoin in the physical plan, and
  * unpartitioned (whole-corpus) windows in the optimized logical plan —
  * flagging any occurrence that survives the waiver list. The plan-review
  * loop the 100 TB stance requires, run against the whole suite at once
  * instead of one `ExplainDump` at a time.
  *
  * Waivers are PER PATTERN, not per query: a query waived for its benign
  * nested-loop shape (a broadcast ≤8-row stats/query frame joined
  * without a key) still flags if it ever grows a cartesian product or a
  * global window.
  *
  * Enforced two ways: `PlanAuditSpec` runs [[auditAll]] inside `sbt test`
  * (a future query growing an unwaived pattern fails CI), and [[main]]
  * remains the standalone sweep (`runMain graft.tools.PlanAudit [sfDir]`)
  * for ad-hoc use at other scale factors.
  */
object PlanAudit {

  private val Bnlj = "BroadcastNestedLoopJoin"
  private val Cart = "CartesianProduct"

  /** One audit hit: a red-flag `tag` in `query`'s plan, waived or not. */
  final case class Finding(
      query: String, tag: String, waiver: Option[String]) {
    def waived: Boolean = waiver.isDefined
    override def toString: String = waiver match {
      case Some(reason) => s"ok   $query [$tag] (waived: $reason)"
      case None => s"FLAG $query [$tag]"
    }
  }

  /** (query, pattern) → why that pattern is constant-size there. */
  private val Waivers: Map[(String, String), String] = Map(
    ("a11_kmv_set_ops", Bnlj) -> "1-row sketch frames crossed (constant build side)",
    ("q11_important_parts", Bnlj) -> "1-row global-total threshold crossed",
    ("q14_promo_share", Bnlj) -> "1-row aggregate pair",
    ("q15_top_revenue_supplier", Bnlj) -> "1-row max-revenue threshold crossed",
    ("q17_small_qty_revenue", Bnlj) -> "per-part avg broadcast (bounded by part count)",
    ("q22_dormant_balances", Bnlj) -> "1-row avg-balance threshold crossed",
    ("t12_balance_weights", Bnlj) -> "per-class counts broadcast (bounded class count)",
    ("t22_top_ngrams", Bnlj) -> "1-row corpus-total frame crossed",
    ("v12_ivf_recall", Bnlj) -> "8-query ground-truth frame",
    ("v22_ivf_binary_recall", Bnlj) -> "8-query ground-truth frame (v2 composed)",
    ("v14_pq_recall", Bnlj) -> "8-query ground-truth + ADC legs (v2/v10 shapes composed)",
    ("t9_tfidf_top_terms", Bnlj) -> "1-row doc-count frame crossed",
    // the LM-scoring layer crosses 1-row corpus constants (vocab size V,
    // target/raw totals, N+Σdl) into vocab-bounded model tables
    ("t11_packed_chunks", Bnlj) ->
      "1-row doc_id min/max frame crossed in for the deterministic bucket bounds",
    ("t31_bigram_lm_ppl", Bnlj) -> "1-row vocab-size frame crossed into the model table",
    ("t44_nb_langid", Bnlj) ->
      "1-row vocab/doc-total frames + |langs|-row unk frame crossed (bounded label count)",
    ("t44i_nb_langid", Bnlj) ->
      "|langs|-row unk frame crossed into the occurrence tape (bounded label count)",
    ("t45_langid_confusion", Bnlj) ->
      "t44i's |langs|-row unk frame (confusion rides the same scoring plan)",
    ("t46_langid_quality", Bnlj) ->
      "t44i's |langs|-row unk frame (the P/R/F1 rollup rides the confusion plan)",
    ("t48_quality_classifier_keep", Bnlj) ->
      "t44's 1-row vocab/doc-total frames + 2-row (hiq/loq) unk frame crossed",
    ("t48i_quality_classifier_keep", Bnlj) ->
      "2-row (hiq/loq) unk frame crossed into the occurrence tape",
    ("t53_quality_calibration", Bnlj) ->
      "rides the t48 scoring plan (same bounded frames crossed)",
    ("t31i_bigram_lm_ppl", Bnlj) -> "1-row unk-floor frame crossed into the scoring leg",
    ("t34_lm_gated_selection", Bnlj) -> "t31's 1-row vocab-size frame (composed gate keeps the leg plans)",
    ("t35_trigram_lm_ppl", Bnlj) -> "1-row (N, V) frame crossed into the trigram model table",
    ("t36_rrf_fusion", Bnlj) -> "t33's 1-row (N, sumdl) frame on both retriever legs",
    ("t32_dsir_weights", Bnlj) -> "1-row target/raw totals frame crossed into the 256-row feature table",
    ("t33_bm25_topk", Bnlj) -> "1-row (N, sumdl) frame crossed into the scored-terms leg",
    ("g5_code_pagerank", Bnlj) -> "1-row rank-constants frame crossed per iteration",
    ("v2_brute_force_topk", Bnlj) -> "8-query broadcast side (exact baseline by design)",
    ("v17_adaptive_topk", Bnlj) -> "8-query broadcast side on the coarse stage; rescore frame is RefineC-bounded",
    ("v18_adaptive_recall", Bnlj) -> "composes the v2 + v17 shapes (8-query broadcast sides)",
    ("v19_binary_hamming_topk", Bnlj) ->
      "8-query broadcast side on the Hamming stage; rescore frame is RerankC-bounded",
    ("v20_binary_recall", Bnlj) -> "composes the v2 + v19 shapes (8-query broadcast sides)",
    ("v23_int8_topk", Bnlj) ->
      "8-query broadcast side on the code-cosine stage; rescore frame is RerankC-bounded",
    ("v24_int8_recall", Bnlj) -> "composes the v2 + v23 shapes (8-query broadcast sides)",
    ("v26_filtered_recall", Bnlj) ->
      "the filtered ground-truth leg is the v2 shape (8-query broadcast side)",
    ("t56_source_overlap_matrix", Bnlj) ->
      "|sources|-row sketch frames crossed for the pair algebra (broadcast-sized by construction)",
    ("v10_pq_topk", Bnlj) -> "8-query broadcast side, ADC over codes",
    ("m5_feature_topk", Bnlj) -> "8-query broadcast side over decoded features",
    // the t11 offsets window runs over a numPartitions-row side frame
    // (broadcastable by construction — see TrainingPrep.packedChunks)
    ("t11_packed_chunks", "GlobalWindow") -> "window over the per-partition offset table",
    // t26/t27 reuse t11's two-phase prefix-sum: the only global window is
    // over the numPartitions-row offset table (TrainingPrep.shardedDocs)
    ("t26_shard_assignment", "GlobalWindow") -> "window over the per-partition offset table",
    ("t27_shard_manifest", "GlobalWindow") -> "window over the per-partition offset table",
    // the t29 totals window runs over the |sources|-row per-source token
    // aggregate (TrainingPrep.mixtureSelection) — constant-size at any sf
    ("t29_mixture_selection", "GlobalWindow") -> "window over the per-source rate table",
    // the t51 ranking window runs over the |sources|-row schedule frame
    ("t51_epoch_schedule", "GlobalWindow") -> "window over the per-source schedule frame",
    // the d16 cumulative window runs over the ≤15-row jaccard-bucket
    // histogram (Dedup.thresholdSensitivity) — constant-size at any sf
    ("d16_threshold_sensitivity", "GlobalWindow") -> "window over the ≤15-row threshold-bucket frame",
    ("d16i_threshold_sensitivity", "GlobalWindow") -> "window over the ≤15-row threshold-bucket frame",
    ("t51_epoch_schedule", Bnlj) -> "1-row corpus-total frame crossed into the per-source frame",
    // the brand-ranking fixture window runs over the ~25-row distinct
    // p_brand frame (Fixtures.codeLists) — constant-size at any sf
    ("flagship_updates", "GlobalWindow") -> "dense_rank over the ~25-row brand fixture frame",
    ("j1_order_lookup", "GlobalWindow") -> "dense_rank over the ~25-row brand fixture frame",
    ("p8_option_updates_no_nodeid", "GlobalWindow") -> "dense_rank over the ~25-row brand fixture frame")

  /** Audit ONE built query plan. Pattern detection only — no jobs run
    * (the physical plan here is the pre-execution one; AQE re-plans are
    * out of scope because the red flags below are static shapes).
    */
  def audit(name: String, df: DataFrame): Seq[Finding] = {
    val qe = df.queryExecution
    val physical = qe.executedPlan.toString
    // partitionBy(lit(0)) and other foldable keys constant-fold away,
    // so an EMPTY partitionSpec here is a genuinely global window
    val globalWindows = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    val hits =
      Seq(Cart, Bnlj).filter(physical.contains) ++
        (if (globalWindows.nonEmpty) Seq("GlobalWindow") else Nil)
    hits.map(tag => Finding(name, tag, Waivers.get((name, tag))))
  }

  /** Sweep every registered query at `dir`. Returns (findings, errors):
    * an erroring query is a failure of the audit, not a silent skip.
    */
  def auditAll(
      spark: SparkSession, dir: String): (Seq[Finding], Seq[(String, String)]) = {
    val acc = Seq.newBuilder[Finding]
    val errs = Seq.newBuilder[(String, String)]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        acc ++= audit(name, fn(spark, dir))
        spark.catalog.clearCache()
      } catch {
        case e: Throwable => errs += name -> String.valueOf(e.getMessage)
      }
    }
    (acc.result(), errs.result())
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // keep catalog droppings (managed index tables, empty warehouse
      // dirs) out of the launch CWD - same rule as the test suites.
      // Per-run UUID: a fixed path lets a killed prior JVM's orphaned
      // managed-table locations fail this run's CREATE TABLE AS with
      // LOCATION_ALREADY_EXISTS (in-memory catalog dies, location stays)
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-${java.util.UUID.randomUUID().toString.take(8)}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (findings, errors) = auditAll(spark, dir)
    findings.foreach(f => println(f.toString))
    errors.foreach { case (n, m) => println(s"ERR  $n: $m") }
    val flagged = findings.count(!_.waived) + errors.size
    println(s"plan audit: ${if (flagged == 0) "CLEAN" else s"$flagged FLAGGED"}")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
