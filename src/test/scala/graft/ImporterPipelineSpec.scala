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
}
