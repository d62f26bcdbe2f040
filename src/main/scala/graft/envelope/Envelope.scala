package graft.envelope

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RPC reply address: which service (and where) should receive the reply.
  *
  * Mirrors the reference's reply-to address
  * (reference: typebus/macros/src/main/scala/io/surfkit/typebus/event/package.scala:122
  * `RpcClient(path, service)`). In Spark there is no actor path; the reply
  * is routed purely by `service` (the reply topic) — see
  * [[graft.rpc.Rpc]].
  */
final case class RpcClient(path: String, service: String)

/** Event metadata envelope.
  *
  * Field-for-field the reference's `EventMeta`
  * (reference: event/package.scala:140-149), with `occurredAt` as a
  * timestamp column usable for Structured Streaming watermarks.
  */
final case class EventMeta(
    eventId: String,
    eventType: String,
    correlationId: Option[String] = None,
    trace: Boolean = false,
    directReply: Option[RpcClient] = None,
    key: Option[String] = None,
    socketId: Option[String] = None,
    responseTo: Option[String] = None,
    extra: Map[String, String] = Map.empty,
    occurredAt: java.sql.Timestamp = new java.sql.Timestamp(0L)
)

/** The wire envelope: metadata + opaque serialized payload
  * (reference: event/package.scala:166-169 `PublishedEvent(meta, payload)`).
  */
final case class PublishedEvent(meta: EventMeta, payload: Array[Byte])

/** Error event published when a handler fails
  * (reference: event/package.scala:28-33 `ServiceException`).
  */
final case class ServiceException(
    message: String,
    throwableType: String,
    stackTrace: Seq[String] = Seq.empty,
    extra: Map[String, String] = Map.empty
)

/** Envelope codec: typed `Dataset[T]` ↔ enveloped `DataFrame`.
  *
  * The reference serializes payloads as Avro binary via avro4s
  * (reference: typebus/src/main/scala/io/surfkit/typebus/Mapper.scala:46-67).
  * This build environment ships no `spark-avro` module, so the wire format
  * is JSON-in-binary — identical envelope semantics, different byte
  * encoding (the reference itself offers the same JSON fallback,
  * Mapper.scala:131-158 `AvroJsonStream`). All envelope construction is
  * columnar (`to_json`/`from_json`, `uuid()`) so it stays inside
  * whole-stage codegen and never round-trips through driver-side objects —
  * at 100 TB the envelope wrap/unwrap is a per-row map with zero shuffle.
  */
object EnvelopeCodec {

  /** FQN of a type = its topic name (reference: KafkaBus.scala:63,69 —
    * `new ProducerRecord(event.meta.eventType.fqn, ...)`), with the
    * reference's leading `"api."` strip (event/package.scala:58-65).
    */
  def fqnOf[T](implicit enc: Encoder[T]): String = {
    val n = enc.clsTag.runtimeClass.getName
    if (n.startsWith("api.")) n.stripPrefix("api.") else n
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("eventId", StringType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("correlationId", StringType, nullable = true),
    StructField("trace", BooleanType, nullable = false),
    StructField("directReply", StructType(Seq(
      StructField("path", StringType), StructField("service", StringType))),
      nullable = true),
    StructField("key", StringType, nullable = true),
    StructField("socketId", StringType, nullable = true),
    StructField("responseTo", StringType, nullable = true),
    StructField("extra", MapType(StringType, StringType), nullable = true),
    StructField("occurredAt", TimestampType, nullable = false)
  ))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("meta", metaSchema, nullable = false),
    StructField("payload", BinaryType, nullable = false)
  ))

  /** Wrap a typed dataset into envelope rows. `keyExpr` is the partition
    * key extractor (reference: bus/package.scala:32-46
    * `StreamBuilder.withPartitionKey`); it becomes the Kafka message key /
    * shuffle key downstream.
    */
  def encode[T](ds: Dataset[T], keyExpr: Option[Column] = None,
                correlationId: Option[Column] = None,
                responseTo: Option[Column] = None,
                directReplyService: Option[String] = None)
               (implicit enc: Encoder[T]): DataFrame = {
    val fqn = fqnOf[T]
    val reply = directReplyService match {
      case Some(svc) => struct(lit("").as("path"), lit(svc).as("service"))
      case None      => lit(null).cast(metaSchema("directReply").dataType)
    }
    ds.select(
      struct(
        expr("uuid()").as("eventId"),
        lit(fqn).as("eventType"),
        correlationId.getOrElse(lit(null).cast(StringType)).as("correlationId"),
        lit(false).as("trace"),
        reply.as("directReply"),
        keyExpr.map(_.cast(StringType)).getOrElse(lit(null).cast(StringType)).as("key"),
        lit(null).cast(StringType).as("socketId"),
        responseTo.getOrElse(lit(null).cast(StringType)).as("responseTo"),
        map().cast(MapType(StringType, StringType)).as("extra"),
        current_timestamp().as("occurredAt")
      ).as("meta"),
      to_json(struct(ds.columns.map(col).toIndexedSeq: _*)).cast(BinaryType).as("payload")
    )
  }

  /** Unwrap envelope rows of a given payload type back into `(T, meta)`.
    * Mirrors the reader-lookup-by-eventType dispatch
    * (reference: bus/package.scala:141-142).
    */
  def decode[T](df: DataFrame)(implicit enc: Encoder[T]): DataFrame = {
    val fqn = fqnOf[T]
    df.filter(col("meta.eventType") === fqn)
      .select(col("meta"), from_json(col("payload").cast(StringType), enc.schema).as("value"))
  }

  /** Typed view of [[decode]] — payload only. */
  def decodeTyped[T](df: DataFrame)(implicit enc: Encoder[T]): Dataset[T] =
    decode[T](df).select("value.*").as[T]
}
