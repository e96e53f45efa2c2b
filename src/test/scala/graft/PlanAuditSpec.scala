package graft

import graft.tools.PlanAudit

/** CI enforcement of the suite-wide plan audit: every registered query's
  * plan must be free of unwaived CartesianProduct / BroadcastNestedLoopJoin
  * / global-window shapes at sf0.001 — the same sweep and waiver map as
  * the standalone `runMain graft.tools.PlanAudit`, so a future query that
  * grows a scale red flag fails `sbt test` instead of waiting for a
  * manual tool run.
  */
class PlanAuditSpec extends SparkSuite {

  test("no registered query carries an unwaived scale red flag") {
    val (findings, errors) = PlanAudit.auditAll(spark, sf0001)
    assert(errors.isEmpty,
      s"queries errored during audit: ${errors.map { case (n, m) => s"$n: $m" }.mkString("; ")}")
    val flagged = findings.filterNot(_.waived)
    assert(flagged.isEmpty,
      s"unwaived plan red flags: ${flagged.mkString("; ")}")
    // the sweep must actually be LOOKING at plans — the waived benign
    // shapes (1-row threshold crossings etc.) are a fixed part of the
    // suite, so a run that sees none of them inspected nothing
    assert(findings.exists(_.waived), "audit saw no findings at all — sweep is vacuous")
  }

  test("a deliberately bad plan is flagged, not waived") {
    // cartesian product: the unambiguous never-at-scale shape (sides
    // sized past the broadcast threshold so the planner can't rescue the
    // cross join into a BNLJ; plan-only, nothing executes)
    val big = spark.range(10000000L).toDF("a")
    val alsoBig = spark.range(10000000L).toDF("b")
    val cart = PlanAudit.audit("fixture_bad_query", big.crossJoin(alsoBig))
    assert(cart.exists(f => f.tag == "CartesianProduct" && !f.waived),
      s"cartesian not flagged: $cart")
    // global window: whole-corpus single-partition sort
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gw = PlanAudit.audit("fixture_bad_query",
      big.withColumn("rn", row_number().over(Window.orderBy(col("a")))))
    assert(gw.exists(f => f.tag == "GlobalWindow" && !f.waived),
      s"global window not flagged: $gw")
  }

  test("a broadcast hint on an unbounded corpus-derived frame is flagged") {
    import org.apache.spark.sql.functions._
    // the round-13 w8/w9/w10 shape: a user-cardinality aggregate of the
    // event log force-broadcast into a join — O(corpus) rows at 100 TB,
    // past the 8 GB broadcast hard limit
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val cohort = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val bad = ev.join(broadcast(cohort), "user_id")
    val hits = PlanAudit.audit("fixture_bad_query", bad)
    assert(hits.exists(f => f.tag.startsWith("UnboundedBroadcast") && !f.waived),
      s"unbounded broadcast not flagged: $hits")
    // the shape descriptor pins the offending frame, so a waiver for one
    // frame cannot silently cover a different one
    assert(hits.exists(_.tag == "UnboundedBroadcast[agg:user_id]"), s"$hits")
    // ...while a limit-bounded frame from the same table is fine (the
    // ANN 8-query probe shape)
    val bounded = ev.join(broadcast(cohort.limit(8)), "user_id")
    assert(!PlanAudit.audit("fixture_ok_query", bounded)
      .exists(_.tag.startsWith("UnboundedBroadcast")))
  }
}
