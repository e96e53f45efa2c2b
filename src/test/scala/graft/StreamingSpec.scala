package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ImporterStream

/** Streaming shell: the batch DAG under foreachBatch with cross-batch
  * idempotency (ST1/ST3) and dead-letter side output (ST4).
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("micro-batches accumulate; duplicate instance in later batch is skipped") {
    val outDir = Files.createTempDirectory("stream-out").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    val dims = Seq(
      ("A", "A_geo", "England", "n1"),
      ("B", "B_geo", "Wales", "n2"))
      .toDF("instance_id", "dimension_id", "option", "node_id")
      .withColumn("links", struct(struct(lit("myCodeList").as("id")).as("code_list")))
    val projected = graft.operators.ImporterPipeline.projectDimensions(dims)
    val codeLists = Seq(
      ("myCodeList", "England", Some(0)), ("myCodeList", "Wales", Some(1)))
      .toDF("code_list_id", "code", "ord")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF().toDF("file_url", "instance_id")

    val q = ImporterStream.start(spark, stream, projected, codeLists, outDir, ckpt)
    try {
      mem.addData(("/a", "A"), ("/bad", ""))
      q.processAllAvailable()
      // batch 2 redelivers A (at-least-once) and adds B
      mem.addData(("/a", "A"), ("/b", "B"))
      q.processAllAvailable()
    } finally q.stop()

    val updates = spark.read.parquet(s"$outDir/updates")
      .select("instance_id", "option").as[(String, String)].collect().toSeq
    // A processed exactly once despite redelivery
    assert(updates.sorted === Seq(("A", "England"), ("B", "Wales")))

    val completed = spark.read.parquet(s"$outDir/completed")
      .select("instance_id").as[String].collect().toSeq.sorted
    assert(completed === Seq("A", "B"))

    val errors = spark.read.parquet(s"$outDir/errors")
      .select("file_url").as[String].collect().toSeq
    assert(errors === Seq("/bad"))

    val processed = spark.read.parquet(s"$outDir/processed_instances")
      .as[String].collect().toSeq.sorted
    assert(processed === Seq("A", "B"))
  }

  test("file-source stream restarts from checkpoint without reprocessing (ST5)") {
    val srcDir = Files.createTempDirectory("stream-src").toString
    val outDir = Files.createTempDirectory("stream-out2").toString
    val ckpt = Files.createTempDirectory("stream-ckpt2").toString

    val dims = graft.operators.ImporterPipeline.projectDimensions(
      Seq(("A", "A_geo", "England", "n1"), ("B", "B_geo", "Wales", "n2"))
        .toDF("instance_id", "dimension_id", "option", "node_id")
        .withColumn("links", struct(struct(lit("myCodeList").as("id")).as("code_list"))))
    val codeLists = Seq(("myCodeList", "England", Some(0)), ("myCodeList", "Wales", Some(1)))
      .toDF("code_list_id", "code", "ord")

    def fileStream = spark.readStream
      .schema("file_url STRING, instance_id STRING")
      .parquet(srcDir)

    Seq(("/a", "A")).toDF("file_url", "instance_id")
      .write.mode("append").parquet(srcDir)
    val q1 = ImporterStream.start(spark, fileStream, dims, codeLists, outDir, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // second life of the query: same checkpoint, new file redelivering A + new B
    Seq(("/a", "A"), ("/b", "B")).toDF("file_url", "instance_id")
      .write.mode("append").parquet(srcDir)
    val q2 = ImporterStream.start(spark, fileStream, dims, codeLists, outDir, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val updates = spark.read.parquet(s"$outDir/updates")
      .select("instance_id").as[String].collect().toSeq.sorted
    // A exactly once across the restart; B picked up after recovery
    assert(updates === Seq("A", "B"))
  }
}
