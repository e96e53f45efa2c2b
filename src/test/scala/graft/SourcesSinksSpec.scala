package graft

import graft.sinks.BatchedPatchSink
import org.apache.spark.sql.functions.{col, concat, lit, when}
import graft.sinks.BatchedPatchSink.RecordingClient

/** DataSourceV2 paged source + batched PATCH sink parity tests. */
class SourcesSinksSpec extends SparkSuite {
  import spark.implicits._

  private def paged(total: Int, pageSize: Int) =
    spark.read.format("graft-paged-api")
      .option("instanceId", "42")
      .option("totalItems", total.toString)
      .option("pageSize", pageSize.toString)
      .load()

  test("paged source: one input partition per page (B4 parity)") {
    val df = paged(1000, 100)
    assert(df.rdd.getNumPartitions === 10)
    assert(df.count() === 1000)
  }

  test("paged source: ragged last page") {
    val df = paged(1001, 100)
    assert(df.rdd.getNumPartitions === 11)
    assert(df.count() === 1001)
  }

  test("paged source: deterministic rows with correct cardinalities") {
    val df = paged(1000, 100)
    assert(df.select("dimension_id").distinct().count() === 7)
    assert(df.select("option").distinct().count() === 50)
    val first = df.filter("dimension_id = '42_d0'").select("option")
      .as[String].collect().toSet
    assert(first.contains("opt0"))
  }

  test("paged source: column pruning pushed into the scan") {
    val pruned = paged(1000, 100).select("option")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("option"))
    assert(!scan.contains("dimension_id"))
    assert(pruned.distinct().count() === 50)
  }

  test("paged source: custom fetcher class drops into the partition-per-page reader") {
    val df = spark.read.format("graft-paged-api")
      .option("instanceId", "7")
      .option("totalItems", "250")
      .option("pageSize", "100")
      .option("fetcher", classOf[StubHttpFetcher].getName)
      .load()
    // same partition-per-page planning, rows from the injected impl
    assert(df.rdd.getNumPartitions === 3)
    val rows = df.filter(col("option") === "stub-opt-0")
      .select("instance_id", "dimension_id", "code_list_id")
      .as[(String, String, String)].collect().toSet
    assert(rows === Set(("7", "7_stub_0", "stub-cl")))
    // per-page construction: one fetcher instance per partition per action
    StubHttpFetcher.constructed.set(0)
    assert(df.count() === 250)
    assert(StubHttpFetcher.constructed.get() === 3)
  }

  test("paged source: java.net.http fetcher pages a live stub server with auth and retry") {
    import graft.sources.HttpDimensionFetcher
    val Total = 250
    // offset/limit stub of the reference's dimension listing; first hit
    // answers 503 so the fetcher's retry path is exercised end-to-end
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val first503 = new java.util.concurrent.atomic.AtomicBoolean(true)
    val unauthed = new java.util.concurrent.atomic.AtomicInteger(0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/instances/42/dimensions", exchange => {
      hits.incrementAndGet()
      val auth = exchange.getRequestHeaders.getFirst("Authorization")
      if (auth != "Bearer test-token") unauthed.incrementAndGet()
      if (first503.getAndSet(false)) {
        exchange.sendResponseHeaders(503, -1); exchange.close()
      } else {
        val params = exchange.getRequestURI.getQuery.split('&')
          .map(_.split('=')).map(kv => kv(0) -> kv(1).toLong).toMap
        val offset = params("offset")
        val end = math.min(offset + params("limit"), Total.toLong)
        val items = (offset until end).map(i =>
          s"""{"dimension":"d${i % 7}","option":"opt${i % 50}",""" +
            s""""links":{"code_list":{"id":"cl${i % 7}"}}}""").mkString(",")
        val body = s"""{"items":[$items],"count":${end - offset},"total_count":$Total}"""
          .getBytes("UTF-8")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
        exchange.close()
      }
    })
    server.start()
    sys.props(HttpDimensionFetcher.UrlProp) =
      s"http://127.0.0.1:${server.getAddress.getPort}"
    sys.props(HttpDimensionFetcher.TokenProp) = "test-token"
    try {
      val http = spark.read.format("graft-paged-api")
        .option("instanceId", "42")
        .option("totalItems", Total.toString)
        .option("pageSize", "100")
        .option("fetcher", classOf[HttpDimensionFetcher].getName)
        .load()
      // the real client must produce EXACTLY the deterministic-fake rows —
      // the stub serves the same (instanceId, i) function over the wire
      val viaHttp = http.collect().map(_.toSeq).sortBy(_.toString)
      val viaFake = paged(Total, 100).collect().map(_.toSeq).sortBy(_.toString)
      assert(viaHttp === viaFake)
      assert(hits.get() >= 4, "3 pages + at least the retried 503")
      assert(unauthed.get() === 0, "every request must carry the service token")
      assert(!first503.get(), "the 503 page must have been retried, not dropped")
    } finally {
      sys.props -= HttpDimensionFetcher.UrlProp
      sys.props -= HttpDimensionFetcher.TokenProp
      server.stop(0)
    }
  }

  test("patch sink: exactly one client call per batchSize partition (O1 parity)") {
    RecordingClient.reset()
    val updates = (1 to 10).map(i => (s"i$i", s"opt$i")).toDF("instance_id", "option")
    val calls = BatchedPatchSink.write(updates, batchSize = 3, new RecordingClient)
    assert(calls === 4)
    assert(RecordingClient.calls.get() === 4)
    assert(RecordingClient.rows.get() === 10)
  }

  test("graph nodes write partitioned by label and read back losslessly") {
    val out = java.nio.file.Files.createTempDirectory("nodes-out").toString
    val nodes = graft.operators.ImporterPipeline.graphNodes(
      graft.operators.ImporterPipeline.projectInstances(
        graft.sources.Fixtures.instances(spark, sf0001)),
      Seq(("i1", "i1_geo", "England", "n1", "cl"))
        .toDF("instance_id", "dimension_id", "option", "node_id", "code_list_id"))
    nodes.write.partitionBy("label").mode("overwrite").parquet(out)
    // partition pruning: reading one label touches only its directory
    val labels = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("label="))
    assert(labels.toSet === Set("label=Instance", "label=DimensionOption"))
    val back = spark.read.parquet(out)
    assert(back.count() === nodes.count())
    val pruned = back.filter(col("label") === "Instance")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(label"), scan)
  }

  test("patch sink local variant: no shuffle, every call bounded by batchSize") {
    RecordingClient.reset()
    val updates = (1 to 100).map(i => (s"i$i", s"o$i")).toDF("instance_id", "option")
      .repartition(4)
    BatchedPatchSink.writeLocal(updates, batchSize = 8, new RecordingClient)
    assert(RecordingClient.rows.get() === 100)
    // every call respects the batch bound; call count is between the ideal
    // ceil(100/8) and one underfull call per partition extra
    assert(RecordingClient.maxBatch.get() <= 8)
    assert(RecordingClient.calls.get() >= 13 && RecordingClient.calls.get() <= 17)
  }

  test("graph sink DSv2: commit protocol delivers each partition exactly once") {
    import graft.sinks.GraphNodeSink
    GraphNodeSink.reset()
    val nodes = (1 to 200).map(i => (s"option/d$i/o$i", "DimensionOption", s"n$i"))
      .toDF("id", "label", "props")
      .repartition(7)
    nodes.write.format("graft-graph-sink").mode("append").option("jobId", "job-A").save()
    // driver-side commit saw every partition's message and promoted them
    assert(GraphNodeSink.jobCommits.get("job-A") === 200L)
    assert(GraphNodeSink.rowsFor("job-A").map(_._1).sorted ===
      (1 to 200).map(i => s"option/d$i/o$i").sorted)
    assert(GraphNodeSink.aborts.get() === 0)
    // a second job with its own id does not disturb the first
    Seq(("x", "Instance", "p")).toDF("id", "label", "props")
      .write.format("graft-graph-sink").mode("append").option("jobId", "job-B").save()
    assert(GraphNodeSink.rowsFor("job-A").size === 200)
    assert(GraphNodeSink.rowsFor("job-B") === Seq(("x", "Instance", "p")))
  }

  test("graph sink DSv2: nothing becomes visible when the job fails mid-write") {
    import graft.sinks.GraphNodeSink
    GraphNodeSink.reset()
    // conf BEFORE the frame is analyzed: the Divide's eval mode is
    // captured at construction, not at execution
    spark.conf.set("spark.sql.ansi.enabled", "true") // make /0 throw
    try intercept[Exception] {
      val poisoned = (1 to 50).map(i => (i, s"n$i")).toDF("k", "props")
        .select(
          when(col("k") === 42, (col("k") / lit(0)).cast("string"))
            .otherwise(concat(lit("id"), col("k"))).as("id"),
          lit("L").as("label"), col("props"))
        .repartition(5)
      poisoned.write.format("graft-graph-sink").mode("append").option("jobId", "job-F").save()
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    assert(GraphNodeSink.rowsFor("job-F").isEmpty, "aborted job leaked rows")
    assert(GraphNodeSink.jobCommits.get("job-F") === null)
  }

  test("graph sink DSv2: jdbc target commits exactly once and replaces on re-run") {
    val url = "jdbc:derby:memory:graftsink;create=true"
    def jdbcNodes(jobId: String) = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT_NODES").load()
      .filter(col("JOB_ID") === jobId)
    val nodes = (1 to 120).map(i => (s"option/d$i/o$i", "DimensionOption", s"n$i"))
      .toDF("id", "label", "props")
      .repartition(5)
    nodes.write.format("graft-graph-sink").mode("append")
      .option("jobId", "jdbc-A").option("target", "jdbc").option("url", url).save()
    assert(jdbcNodes("jdbc-A").count() === 120)
    // staging fully promoted — nothing left behind
    val staged = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT_NODES_STAGING").load()
    assert(staged.filter(col("JOB_ID") === "jdbc-A").count() === 0)
    // re-running the same jobId REPLACES its rows (no duplicates)
    val fewer = (1 to 30).map(i => (s"option/x$i", "DimensionOption", s"n$i"))
      .toDF("id", "label", "props").repartition(2)
    fewer.write.format("graft-graph-sink").mode("append")
      .option("jobId", "jdbc-A").option("target", "jdbc").option("url", url).save()
    assert(jdbcNodes("jdbc-A").count() === 30)
    assert(jdbcNodes("jdbc-A").select("ID").as[String].collect().forall(_.startsWith("option/x")))
  }

  test("graph sink DSv2: jdbc target aborted job leaves no visible or staged rows") {
    val url = "jdbc:derby:memory:graftsink;create=true"
    spark.conf.set("spark.sql.ansi.enabled", "true") // make /0 throw
    try {
      intercept[Exception] {
        val poisoned = spark.range(100).toDF("k")
          .select(
            when(col("k") === 99, concat(lit("boom"), (lit(1) / lit(0)).cast("string")))
              .otherwise(concat(lit("id"), col("k"))).as("id"),
            lit("L").as("label"), lit("p").as("props"))
          .repartition(4)
        poisoned.write.format("graft-graph-sink").mode("append")
          .option("jobId", "jdbc-F").option("target", "jdbc").option("url", url).save()
      }
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    val read = (t: String) => spark.read.format("jdbc")
      .option("url", url).option("dbtable", t).load().filter(col("JOB_ID") === "jdbc-F")
    assert(read("GRAFT_NODES").count() === 0, "aborted job leaked visible rows")
    assert(read("GRAFT_NODES_STAGING").count() === 0, "aborted job leaked staging rows")
  }

  test("patch sink: If-Match token round-trips — stale etag 412s, wildcard never does") {
    import graft.sinks.BatchedPatchSink.{EtagAny, PreconditionFailedException, VersionedClient}
    VersionedClient.reset()
    val updates = (1 to 5).map(i => (s"i$i", s"o$i")).toDF("instance_id", "option")
    // single-batch write with the CORRECT token succeeds and bumps the etag
    assert(BatchedPatchSink.write(updates, batchSize = 100, new VersionedClient,
      ifMatch = "v0") === 1)
    assert(VersionedClient.version.get() === 1)
    // replaying the consumed token is a conflict (HTTP 412 semantics)
    val ex = intercept[org.apache.spark.SparkException] {
      BatchedPatchSink.write(updates, batchSize = 100, new VersionedClient, ifMatch = "v0")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[PreconditionFailedException]))
    assert(VersionedClient.version.get() === 1, "failed precondition must not bump")
    // the wildcard (what the reference always passes) matches any version,
    // including across a multi-batch write
    assert(BatchedPatchSink.write(updates, batchSize = 2, new VersionedClient,
      ifMatch = EtagAny) === 3)
    assert(VersionedClient.version.get() === 4)
  }

  test("patch sink: single call when everything fits one batch") {
    RecordingClient.reset()
    val updates = (1 to 5).map(i => (s"i$i", s"o$i")).toDF("instance_id", "option")
    assert(BatchedPatchSink.write(updates, batchSize = 100, new RecordingClient) === 1)
    assert(RecordingClient.calls.get() === 1)
  }
}

/** In-JVM stand-in for an HTTP-backed [[graft.sources.DimensionPageFetcher]]:
  * what a real `java.net.http` impl would look like behind the seam, with a
  * construction counter to prove one-instance-per-page.
  */
class StubHttpFetcher extends graft.sources.DimensionPageFetcher {
  StubHttpFetcher.constructed.incrementAndGet()
  override def fetchPage(
      instanceId: String, start: Long, end: Long): Iterator[graft.sources.DimensionItem] =
    Iterator.range(start, end).map(i => graft.sources.DimensionItem(
      instanceId, s"${instanceId}_stub_${i % 3}", s"stub-opt-$i", "stub-cl"))
}

object StubHttpFetcher {
  val constructed = new java.util.concurrent.atomic.AtomicInteger(0)
}
