package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ImporterPipeline._

/** Behavioral port of the reference's handler choreography tests
  * (`handler/incoming_instance_handler_test.go`): the same fixtures
  * (instance 1234567890, code list myCodeList, England/Wales/Scotland with
  * orders 0/1/null) asserted as expected output tables instead of
  * mock-call counts.
  */
class ImporterPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def links(codeList: String) =
    struct(struct(lit(codeList).as("id")).as("code_list")).as("links")

  lazy val apiDims: DataFrame = Seq(
    ("1234567890", "1234567890_Geography", "England", "n1"),
    ("1234567890", "1234567890_Geography", "Wales", "n2"),
    ("1234567890", "1234567890_Geography", "Scotland", "n3"))
    .toDF("instance_id", "dimension_id", "option", "node_id")
    .withColumn("links", links("myCodeList"))
    .unionAll(
      Seq(("1234567890", "1234567890_time", "2017", "n4"))
        .toDF("instance_id", "dimension_id", "option", "node_id")
        .withColumn("links", links("time")))

  lazy val codeLists: DataFrame = Seq(
    ("myCodeList", "England", Some(0)),
    ("myCodeList", "Wales", Some(1)),
    ("myCodeList", "Scotland", None))
    .toDF("code_list_id", "code", "ord")

  test("P1 projection flattens nested links.code_list.id") {
    val got = projectDimensions(apiDims).select("dimension_id", "code_list_id")
      .as[(String, String)].collect().toSet
    assert(got === Set(
      ("1234567890_Geography", "myCodeList"),
      ("1234567890_time", "time")))
  }

  test("P9 name extraction strips the instance prefix (models.go:47-52)") {
    val got = dimensionNames(projectDimensions(apiDims))
      .as[(String, String)].collect().toMap
    assert(got("1234567890_Geography") === "Geography")
    assert(got("1234567890_time") === "time")
  }

  test("J1+P8 nullable order tri-state (handler_test.go:738-828)") {
    val dims = dedupOptions(validDimensions(projectDimensions(apiDims)))
    val withOrd = withOrder(dims, codeLists)

    // Scotland has no defined order -> ord is null but the update survives
    // because node_id is set (partial PATCH).
    val updates = optionUpdates(withOrd, enablePatchNodeId = true)
      .select("option", "node_id", "ord")
      .as[(String, String, Option[Int])].collect().toSet
    assert(updates.contains(("England", "n1", Some(0))))
    assert(updates.contains(("Wales", "n2", Some(1))))
    assert(updates.contains(("Scotland", "n3", None)))

    // With node-id patching disabled the Scotland row is a no-op and drops.
    val noNode = optionUpdates(withOrd, enablePatchNodeId = false)
      .select("option").as[String].collect().toSet
    assert(noNode === Set("England", "Wales"))
  }

  test("P7 time dimension excluded from code edges (handler :294-302)") {
    val dims = dedupOptions(validDimensions(projectDimensions(apiDims)))
    val timeList = Seq(("time", "2017", Some(9))).toDF("code_list_id", "code", "ord")
    val edges = codeEdges(dims, codeLists.unionAll(timeList))
    val srcs = edges.select("src").as[String].collect()
    assert(srcs.length === 3)
    assert(!srcs.exists(_.contains("_time")))
  }

  test("J2 idempotent skip for existing instances (handler_test.go:939-968)") {
    val events = Seq(
      ("/1/2/3", "1234567890"),
      ("/4/5/6", "999"))
      .toDF("file_url", "instance_id")
    val existing = Seq("1234567890").toDF("instance_id")
    val got = newInstanceEvents(validEvents(events), existing)
      .select("instance_id").as[String].collect().toSeq
    assert(got === Seq("999"))
  }

  test("P3/S12 invalid events route to dead letters, not silently dropped") {
    val events = Seq(
      ("/ok", "42"),
      ("/bad", ""))
      .toDF("file_url", "instance_id")
    assert(validEvents(events).count() === 1)
    val dead = deadLetters(events).select("file_url", "error").as[(String, String)].collect()
    assert(dead.length === 1)
    assert(dead.head._1 === "/bad")
    assert(dead.head._2.contains("instance_id is empty"))
  }

  test("P6 validation labels each failure branch (models.go:55-69)") {
    val bad = Seq(
      ("i", "", "x", "n", "cl"),
      ("i", "d", "", "n", "cl"),
      ("i", "", "", "n", "cl"))
      .toDF("instance_id", "dimension_id", "option", "node_id", "code_list_id")
    val errs = invalidDimensions(bad).select("validation_error").as[String].collect()
    assert(errs.count(_.contains("id is required")) === 1)
    assert(errs.count(_.contains("value is required")) === 1)
    assert(errs.count(_.contains("empty dimension_id and option")) === 1)
  }

  test("S9 uniqueness check finds duplicate observations") {
    val dup = Seq(
      ("i", "d", "x"), ("i", "d", "x"), ("i", "d", "y"))
      .toDF("instance_id", "dimension_id", "option")
    val v = uniquenessViolations(dup, Seq("instance_id", "dimension_id", "option"))
    val rows = v.as[(String, String, String, Long)].collect()
    assert(rows.toSeq === Seq(("i", "d", "x", 2L)))
  }

  test("flagship end-to-end returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("g5 unrolled PageRank DAG equals the checkpointed loop form") {
    val dims = dedupOptions(validDimensions(projectDimensions(apiDims)))
    def toMap(df: DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unrolled = toMap(codePageRank(dims, codeLists, iterations = 3))
    val looped = toMap(codePageRankIterative(dims, codeLists, iterations = 3))
    assert(unrolled.nonEmpty)
    assert(unrolled === looped)
    // every node keeps at least the base (teleport) mass
    assert(unrolled.values.forall(_ > 0L))
  }

  test("A5 bounded variant caps a skewed instance's digest and surfaces the overflow") {
    // one pathological instance with 50 dims, one ordinary with 2
    val rows = (1 to 50).map(i => ("big", f"d$i%03d", "x")) ++
      Seq(("small", "d001", "y"), ("small", "d002", "z"))
    val df = rows.toDF("instance_id", "dimension_id", "option")
    val bounded = instanceDimensionsBounded(df, maxDims = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val big = bounded("big")
    assert(big.getLong(1) === 50L, "n_dims must stay the TRUE count")
    assert(big.getString(2).split('|').length === 10, "digest capped at maxDims")
    assert(big.getInt(3) === 40, "overflow must be visible, not silent")
    // at or under the cap the bounded form is byte-identical to A5
    val small = bounded("small")
    val a5 = instanceDimensions(df).collect()
      .map(r => r.getString(0) -> r).toMap.apply("small")
    assert(small.getLong(1) === a5.getLong(1))
    assert(small.getString(2) === a5.getString(2))
    assert(small.getInt(3) === 0)
  }

  test("g5 above the unrolling cap delegates to the checkpointed loop — plan stays bounded") {
    val dims = dedupOptions(validDimensions(projectDimensions(apiDims)))
    def planLines(df: DataFrame): Int =
      df.queryExecution.logical.numberedTreeString.linesIterator.size
    val capped = codePageRank(dims, codeLists,
      iterations = MaxUnrolledIterations + 4)
    val unrolled3 = codePageRank(dims, codeLists, iterations = 3)
    // the checkpointed loop ends in a bounded scan of materialized ranks;
    // a 12-iteration plan LARGER than the 3-iteration unrolled DAG would
    // mean the delegation regressed and the plan grows per iteration again
    assert(planLines(capped) < planLines(unrolled3),
      s"plan above the cap (${planLines(capped)} lines) must be smaller " +
        s"than the 3-iteration unrolled DAG (${planLines(unrolled3)} lines)")
  }
}
