package graft

import graft.sinks.BatchedPatchSink
import org.apache.spark.sql.Row

/** Config validation matrix (reference config tests) + fail-fast sink
  * semantics (reference O4: first error aborts the batch).
  */
class ConfigFailFastSpec extends SparkSuite {
  import spark.implicits._

  test("config defaults match the reference's") {
    val cfg = GraftConfig.fromEnv(Map.empty).toOption.get
    assert(cfg.batchSize === 1)
    assert(cfg.datasetApiBatchSize === 1000)
    assert(cfg.datasetApiMaxWorkers === 100)
    assert(cfg.enablePatchNodeId)
  }

  test("config validation matrix") {
    assert(GraftConfig.fromEnv(Map("BATCH_SIZE" -> "0")).isLeft)
    assert(GraftConfig.fromEnv(Map("BATCH_SIZE" -> "abc")).isLeft)
    assert(GraftConfig.fromEnv(Map("DATASET_API_MAX_WORKERS" -> "-1")).isLeft)
    assert(GraftConfig.fromEnv(Map("ENABLE_PATCH_NODE_ID" -> "false"))
      .toOption.get.enablePatchNodeId === false)
  }

  test("secrets are redacted from toString") {
    val cfg = GraftConfig.fromEnv(Map("SERVICE_AUTH_TOKEN" -> "sekrit")).toOption.get
    assert(!cfg.toString.contains("sekrit"))
    assert(cfg.toString.contains("<redacted>"))
  }

  test("patch sink fails fast: a failing client aborts the job (O4 parity)") {
    val failing = new BatchedPatchSink.PatchClient {
      def patch(updates: Seq[Row], ifMatch: String): String =
        throw new RuntimeException("downstream PATCH rejected")
    }
    val updates = (1 to 10).map(i => (s"i$i", s"o$i")).toDF("instance_id", "option")
    val ex = intercept[org.apache.spark.SparkException] {
      BatchedPatchSink.write(updates, batchSize = 3, failing)
    }
    assert(ex.getMessage.contains("PATCH rejected") ||
      Option(ex.getCause).exists(_.getMessage.contains("PATCH rejected")))
  }
}
