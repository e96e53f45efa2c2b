package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.{NameValidator, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Avro event boundary (reference S2/S11): the exact record schemas the
  * reference declares inline (`schema/schema.go:7-26` for
  * `dimensions-extracted`, `:28-47` for `dimensions-inserted` — both
  * `{file_url: string, instance_id: string}`), encoded/decoded with plain
  * Avro binary encoding, the wire format of the reference's Kafka messages.
  *
  * The stock `from_avro`/`to_avro` connector is not on this classpath, so
  * the codec runs in `mapPartitions` with per-partition reader/writer reuse
  * — the same shape a Kafka `value: binary` column takes in Structured
  * Streaming.
  *
  * Malformed messages are DROPPED, matching the reference's
  * log-and-continue behavior (`message/kafka_message_receiver.go:35-38`,
  * tested in `message/kafka_message_receiver_test.go:51-76`).
  */
object AvroEvents {

  /** Mirrors reference schema/schema.go:7-21 (dimensions-extracted). */
  val NewInstanceSchemaJson: String =
    """{
      |  "type": "record",
      |  "name": "publish-dataset",
      |  "fields": [
      |    {"name": "file_url", "type": "string"},
      |    {"name": "instance_id", "type": "string"}
      |  ]
      |}""".stripMargin

  /** Mirrors reference schema/schema.go:28-42 (dimensions-inserted). */
  val InstanceCompletedSchemaJson: String =
    """{
      |  "type": "record",
      |  "name": "instance-completed",
      |  "fields": [
      |    {"name": "file_url", "type": "string"},
      |    {"name": "instance_id", "type": "string"}
      |  ]
      |}""".stripMargin

  /** The reference's record names contain hyphens ("publish-dataset"),
    * which Avro 1.12's strict validator rejects (the Go avro library was
    * lenient). Binary encoding never serializes names, so parsing without
    * name validation preserves exact wire compatibility.
    */
  def parse(json: String): Schema =
    new Schema.Parser(NameValidator.NO_VALIDATION).parse(json)

  @transient private lazy val schema = AvroEvents.parse(NewInstanceSchemaJson)

  private def encodeOne(writer: GenericDatumWriter[GenericRecord],
      fileUrl: String, instanceId: String): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("file_url", fileUrl)
    rec.put("instance_id", instanceId)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** events(file_url, instance_id) → single binary `value` column (what the
    * producer writes to the topic, reference `message/producer.go:26-34`).
    */
  def encode(events: DataFrame): Dataset[Array[Byte]] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("file_url", "instance_id").as[(String, String)]
      .mapPartitions { rows =>
        val parsed = AvroEvents.parse(NewInstanceSchemaJson)
        val writer = new GenericDatumWriter[GenericRecord](parsed)
        rows.map { case (u, i) => encodeOne(writer, u, i) }
      }
  }

  /** binary `value` column → events(file_url, instance_id); undecodable
    * payloads dropped (reference at-most-once drop semantics).
    */
  def decode(values: Dataset[Array[Byte]]): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    values.mapPartitions { rows =>
      val parsed = AvroEvents.parse(NewInstanceSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](parsed)
      rows.flatMap { bytes =>
        try {
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          val rec = reader.read(null, dec)
          // reject trailing garbage: a valid prefix is not a valid message
          if (!dec.isEnd) None
          else Some((rec.get("file_url").toString, rec.get("instance_id").toString))
        } catch { case _: Exception => None }
      }
    }.toDF("file_url", "instance_id")
  }

  /** Round-trip query (S2+S11): fixture events → Avro bytes → decode. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame =
    decode(encode(Fixtures.importerEvents(spark, dir)))
}
