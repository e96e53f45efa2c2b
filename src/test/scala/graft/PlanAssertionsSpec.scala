package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan regression guards: the properties reviewed via ExplainDump
  * (broadcast join selection, parquet filter pushdown, column pruning)
  * asserted so a future edit can't silently regress them. These are the
  * 100 TB load-bearing plan shapes.
  */
class PlanAssertionsSpec extends SparkSuite {

  private def executed(df: DataFrame) = {
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan
  }

  test("flagship plan uses only broadcast joins — no sort-merge shuffle joins") {
    // AQE query stages don't expose subplans to collect(); assert on the
    // final plan text instead
    val text = executed(SparkEntry.queries("flagship_updates")(spark, sf0001)).toString
    assert(!text.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$text")
    assert(text.contains("BroadcastHashJoin"))
  }

  test("q1 pushes the shipdate filter and prunes columns at the parquet scan") {
    val scanText = executed(SparkEntry.queries("q1_pricing_summary")(spark, sf0001))
      .toString
    assert(scanText.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // only the 7 needed columns reach the reader — no l_orderkey/partkey/suppkey
    assert(!scanText.contains("l_partkey"))
    assert(!scanText.contains("l_orderkey"))
  }

  test("v2 pushes the query-vector predicate into the scan") {
    val scanText = executed(SparkEntry.queries("v2_brute_force_topk")(spark, sf0001))
      .toString
    assert(scanText.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,8)]"))
  }

  test("ann top-k queries use the bounded-heap aggregate, not a global window sort") {
    // the window formulation funnels corpus×queries onto NumQueries reducer
    // partitions and sorts each fully — the bounded-heap Aggregator ships k
    // rows per query per partition instead (map-side partial aggregation)
    for (q <- Seq("v2_brute_force_topk", "v4_lsh_ann_topk", "v7_ivf_topk")) {
      val text = executed(SparkEntry.queries(q)(spark, sf0001)).toString
      assert(!text.contains("Window"), s"$q still uses a window:\n$text")
      assert(text.contains("ObjectHashAggregate") || text.contains("SortAggregate"),
        s"$q missing the aggregator path:\n$text")
    }
  }

  test("j1 order lookup is a broadcast left-outer join") {
    val text = executed(SparkEntry.queries("j1_order_lookup")(spark, sf0001)).toString
    assert(text.contains("BroadcastHashJoin") && text.contains("LeftOuter"), s"plan:\n$text")
  }

  test("q1 aggregation is two-phase (map-side partial before the exchange)") {
    val text = executed(SparkEntry.queries("q1_pricing_summary")(spark, sf0001)).toString
    val aggCount = "HashAggregate".r.findAllIn(text).length
    assert(aggCount >= 2, s"expected partial+final HashAggregate:\n$text")
  }

  test("v5 computes the bucketed corpus once — census and both join sides reuse the exchange") {
    val text = executed(SparkEntry.queries("v5_embedding_near_dups")(spark, sf0001)).toString
    // the corpus subtree (scan + 2^planes dot products) feeds three
    // consumers; it is materialized once up front, so the pairing plan
    // itself reads the materialized RDD and never re-scans the file
    val scans = "FileScan parquet".r.findAllIn(text).length
    assert(scans === 0, s"expected no embeddings re-scan, got $scans:\n$text")
    assert(text.contains("ExistingRDD") || text.contains("Scan ExistingRDD"), s"plan:\n$text")
  }

  test("paged source scan has no shuffle — pages map straight to partitions") {
    val df = spark.read.format("graft-paged-api")
      .option("totalItems", "500").option("pageSize", "50").load()
    val plan = executed(df)
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }
}
