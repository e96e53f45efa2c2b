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
  * Codec selection is a runtime seam: when the stock `spark-avro`
  * connector is on the classpath its codegen'd `to_avro`/`from_avro`
  * column functions are used (reached via reflection so this module never
  * links against the optional jar); otherwise the hand-rolled codec runs
  * in `mapPartitions` with per-partition reader/writer reuse — the same
  * shape a Kafka `value: binary` column takes in Structured Streaming.
  * Both paths produce the identical wire bytes (binary encoding carries
  * no names or schema), asserted by `SourcesSinksSpec` whenever the
  * connector is present.
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
    * Delegates to the connector when present ([[codec]]).
    */
  def encode(events: DataFrame): Dataset[Array[Byte]] = codec.encode(events)

  /** binary `value` column → events(file_url, instance_id); undecodable
    * payloads dropped (reference at-most-once drop semantics). Delegates to
    * the connector when present ([[codec]]).
    */
  def decode(values: Dataset[Array[Byte]]): DataFrame = codec.decode(values)

  /** Round-trip query (S2+S11): fixture events → Avro bytes → decode. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame =
    decode(encode(Fixtures.importerEvents(spark, dir)))

  // ---------------------------------------------------------------- codecs

  /** One wire codec for the event schema. Implementations must be
    * byte-identical on encode and agree on decode of well-formed payloads;
    * `SourcesSinksSpec` cross-checks them whenever both are available.
    */
  sealed trait Codec {
    def encode(events: DataFrame): Dataset[Array[Byte]]
    def decode(values: Dataset[Array[Byte]]): DataFrame
  }

  /** True iff the optional `spark-avro` connector is on the classpath.
    * Probing `functions$` is NOT enough: Spark 4.x ships `to_avro` /
    * `from_avro` STUBS in spark-sql-api that throw
    * `AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE` at analysis time unless the
    * connector's replacement expressions are loadable — so probe for the
    * replacement class (`AvroDataToCatalyst`) the stub itself resolves.
    */
  lazy val connectorAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst"); true }
    catch { case _: Throwable => false }

  /** The active codec: connector-backed when the jar is present, else the
    * hand-rolled fallback. Resolution is per-JVM (classpath is static).
    */
  lazy val codec: Codec =
    if (connectorAvailable) ConnectorCodec else HandRolledCodec

  /** `mapPartitions` codec over plain `org.apache.avro` (always present). */
  object HandRolledCodec extends Codec {
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
  }

  /** Connector-backed codec: `to_avro`/`from_avro` reached via reflection
    * (the optional jar is not a compile-time dependency). Two deliberate
    * deltas from the fallback, both invisible on the wire:
    *
    *  - the reference's hyphenated record name ("publish-dataset") fails
    *    Avro 1.12's strict validator, which the connector uses internally;
    *    the schema handed to the connector renames the record
    *    ([[connectorSchemaJson]]) — legal because Avro binary encoding
    *    never serializes names, so bytes are unchanged;
    *  - drop-malformed rides `from_avro`'s PERMISSIVE mode (null record →
    *    filtered out) instead of a per-row try/catch.
    */
  object ConnectorCodec extends Codec {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.col

    /** [[NewInstanceSchemaJson]] with a validator-safe record name. */
    val connectorSchemaJson: String =
      NewInstanceSchemaJson.replace("publish-dataset", "publish_dataset")

    private lazy val fns: (AnyRef, Class[_]) = {
      val cls = Class.forName("org.apache.spark.sql.avro.functions$")
      (cls.getField("MODULE$").get(null), cls)
    }

    private def toAvro(data: Column): Column = {
      val (m, cls) = fns
      cls.getMethod("to_avro", classOf[Column], classOf[String])
        .invoke(m, data, connectorSchemaJson).asInstanceOf[Column]
    }

    private def fromAvro(data: Column): Column = {
      val (m, cls) = fns
      val opts = new java.util.HashMap[String, String]()
      opts.put("mode", "PERMISSIVE")
      cls.getMethod("from_avro", classOf[Column], classOf[String],
          classOf[java.util.Map[String, String]])
        .invoke(m, data, connectorSchemaJson, opts).asInstanceOf[Column]
    }

    def encode(events: DataFrame): Dataset[Array[Byte]] = {
      val spark = events.sparkSession
      import spark.implicits._
      events.select(toAvro(org.apache.spark.sql.functions
          .struct(col("file_url"), col("instance_id"))).as("value"))
        .as[Array[Byte]]
    }

    def decode(values: Dataset[Array[Byte]]): DataFrame =
      values.toDF("value")
        .select(fromAvro(col("value")).as("rec"))
        .filter(col("rec").isNotNull &&
          col("rec.file_url").isNotNull && col("rec.instance_id").isNotNull)
        .select(col("rec.file_url").as("file_url"),
          col("rec.instance_id").as("instance_id"))
  }
}
