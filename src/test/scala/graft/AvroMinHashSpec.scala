package graft

import graft.functions.MinHashAgg
import graft.sources.AvroEvents

/** Avro wire-format boundary + MinHash typed-Aggregator semantics. */
class AvroMinHashSpec extends SparkSuite {
  import spark.implicits._

  test("avro round trip is lossless (schema/schema.go parity)") {
    val events = Seq(
      ("s3://dp-frontend-florence-file-uploads/159.csv", "1234567890"),
      ("/1/2/3", ""))
      .toDF("file_url", "instance_id")
    val back = AvroEvents.decode(AvroEvents.encode(events))
      .as[(String, String)].collect().toSet
    assert(back === Set(
      ("s3://dp-frontend-florence-file-uploads/159.csv", "1234567890"),
      ("/1/2/3", "")))
  }

  test("malformed avro payloads are dropped, not failed (receiver_test.go:51-76)") {
    val good = AvroEvents.encode(Seq(("/ok", "42")).toDF("file_url", "instance_id"))
      .collect().head
    val garbage: Array[Byte] = Array(0x7F.toByte) // truncated varint prefix
    val mixed = spark.createDataset(Seq(good, garbage))
    val out = AvroEvents.decode(mixed).as[(String, String)].collect().toSeq
    assert(out === Seq(("/ok", "42")))
  }

  test("codec seam: selection matches the classpath; connector parity when present") {
    // detection must agree with a direct classpath probe — a seam that
    // reports the wrong codec would silently change the executed plan
    // probe the replacement expression class, not functions$: Spark 4.x
    // ships function STUBS that fail at analysis without the connector
    val jarPresent =
      try { Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst"); true }
      catch { case _: Throwable => false }
    assert(AvroEvents.connectorAvailable === jarPresent)
    assert(AvroEvents.codec ===
      (if (jarPresent) AvroEvents.ConnectorCodec else AvroEvents.HandRolledCodec))
    // the connector schema rename is name-only (binary encoding carries no
    // names, so the wire bytes cannot differ)
    assert(AvroEvents.ConnectorCodec.connectorSchemaJson
      .replace("publish_dataset", "publish-dataset") === AvroEvents.NewInstanceSchemaJson)

    // when BOTH codecs can run, they must be byte-identical on encode and
    // agree on decode — the contract that makes the seam safe to flip
    if (jarPresent) {
      val events = Seq(("s3://bucket/file.csv", "id-1"), ("/x", ""))
        .toDF("file_url", "instance_id")
      val viaHand = AvroEvents.HandRolledCodec.encode(events).collect().toSeq
      val viaConn = AvroEvents.ConnectorCodec.encode(events).collect().toSeq
      assert(viaHand.map(_.toSeq).toSet === viaConn.map(_.toSeq).toSet)
      val bytesDs = spark.createDataset(viaHand)
      assert(
        AvroEvents.ConnectorCodec.decode(bytesDs)
          .as[(String, String)].collect().toSet ===
        AvroEvents.HandRolledCodec.decode(bytesDs)
          .as[(String, String)].collect().toSet)
    } else {
      // this environment ships no spark-avro jar: the public API must be
      // riding the fallback, and the fallback alone must round-trip
      val events = Seq(("/a", "1")).toDF("file_url", "instance_id")
      assert(AvroEvents.decode(AvroEvents.encode(events))
        .as[(String, String)].collect().toSeq === Seq(("/a", "1")))
    }
  }

  test("minhash aggregator estimate: identical sets -> 1.0, disjoint -> ~0") {
    val agg = new MinHashAgg(32)
    def sig(items: Seq[String]) =
      items.foldLeft(agg.zero) { (b, s) => agg.reduce(b, s) }.toSeq
    val a = sig((1 to 30).map(i => s"sh$i"))
    val b = sig((1 to 30).map(i => s"sh$i"))
    val c = sig((100 to 130).map(i => s"sh$i"))
    assert(MinHashAgg.estimate(a, b) === 1.0)
    assert(MinHashAgg.estimate(a, c) < 0.2)
  }

  test("minhash aggregator merge is order-insensitive (partial agg safe)") {
    val agg = new MinHashAgg(16)
    val items = (1 to 40).map(i => s"x$i")
    val whole = items.foldLeft(agg.zero)(agg.reduce).toSeq
    val (l, r) = items.splitAt(17)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce)).toSeq
    assert(whole === merged)
  }

  test("d7 query: aggregator signature digests match the expression path") {
    val df = SparkEntry.queries("d7_minhash_agg_signatures")(spark, sf0001)
    val n = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter("size(split(text, ' ')) >= 3").count()
    assert(df.count() === n)
    assert(df.selectExpr("min(sig_len)").as[Int].head() === 32)
    // the UDAF path must agree bit-for-bit with the agg-expression path:
    // digest minhashSignatures' h0..h31 the same way and compare
    import org.apache.spark.sql.functions._
    val exprSide = graft.operators.Dedup
      .minhashSignatures(graft.operators.Dedup.shingles(spark, sf0001))
      .select(
        col("doc_id"),
        md5(concat_ws(",",
          (0 until 32).map(i => col(s"h$i").cast("string")): _*).cast("binary")).as("sig_digest"))
    val agg = df.select("doc_id", "sig_digest").as[(Long, String)].collect().toMap
    val exp = exprSide.as[(Long, String)].collect().toMap
    assert(agg === exp)
  }
}
