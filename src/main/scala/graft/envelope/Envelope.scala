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

/** An envelope routed to a destination topic — the executor-side publish
  * row shape. A Kafka sink consumes exactly this (its `topic` column picks
  * the destination per record, reference: KafkaBus.scala:63,69); the
  * MemoryBus test sink appends per partition through a ForeachWriter.
  */
final case class TopicEnvelope(topic: String, meta: EventMeta, payload: Array[Byte])

/** Error event published when a handler fails
  * (reference: event/package.scala:28-33 `ServiceException`).
  */
final case class ServiceException(
    message: String,
    throwableType: String,
    stackTrace: Seq[String] = Seq.empty,
    extra: Map[String, String] = Map.empty
)

/** Pluggable payload wire format behind the shared envelope shape: every
  * codec produces/consumes the same (`meta`, `payload: BINARY`) rows
  * ([[EnvelopeCodec.envelopeSchema]]), so topic routing, sinks, RPC
  * correlation, and retry are codec-agnostic — exactly the reference's
  * `ByteStreamReader/Writer[A]` seam (reference: typebus/macros/src/main/
  * scala/io/surfkit/typebus/Typebus.scala:20-64), which lets it swap Avro
  * binary and Avro-JSON serde behind one bus.
  *
  * Implementations: [[EnvelopeCodec]] (JSON-in-binary, fully columnar —
  * the reference's `AvroJsonStream` analog, Mapper.scala:131-158) and
  * [[AvroPayloadCodec]] (Avro binary via GenericDatumWriter/Reader —
  * the reference's default `AvroByteStreams`, Mapper.scala:11-121).
  */
trait PayloadCodec {
  def encode[T](ds: Dataset[T], keyExpr: Option[Column] = None,
                correlationId: Option[Column] = None,
                responseTo: Option[Column] = None,
                directReplyService: Option[String] = None)
               (implicit enc: Encoder[T]): DataFrame
  def decodeTyped[T](df: DataFrame)(implicit enc: Encoder[T]): Dataset[T]
  def decodeWithMeta[T](df: DataFrame)(implicit enc: Encoder[T]): Dataset[(T, EventMeta)]
  def decodeFailures[T](df: DataFrame)(implicit enc: Encoder[T]): DataFrame
  def encodeReply[U](ds: Dataset[(U, EventMeta)], keyExpr: Option[Column] = None)
                    (implicit enc: Encoder[U]): DataFrame
}

/** Envelope codec: typed `Dataset[T]` ↔ enveloped `DataFrame`.
  *
  * The reference's DEFAULT serde is Avro binary via avro4s
  * (reference: typebus/src/main/scala/io/surfkit/typebus/Mapper.scala:46-67)
  * — ported as [[AvroPayloadCodec]]. This object is the JSON-in-binary
  * codec — identical envelope semantics, different byte encoding (the
  * reference itself offers the same JSON fallback, Mapper.scala:131-158
  * `AvroJsonStream`). All envelope construction here is columnar
  * (`to_json`/`from_json`, `uuid()`) so it stays inside whole-stage
  * codegen and never round-trips through driver-side objects — at 100 TB
  * the envelope wrap/unwrap is a per-row map with zero shuffle.
  */
object EnvelopeCodec extends PayloadCodec {

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
  override def encode[T](ds: Dataset[T], keyExpr: Option[Column],
                         correlationId: Option[Column],
                         responseTo: Option[Column],
                         directReplyService: Option[String])
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

  /** Internal: parse payload JSON with a corrupt-record canary column.
    * PERMISSIVE from_json yields an all-null struct (not a NULL struct)
    * for malformed input, so "did it parse" needs the canary; "is it
    * usable" additionally needs every non-nullable field present (a
    * valid-JSON `{"n": null}` against a non-nullable Int would otherwise
    * kill the stream with NOT_NULL_ASSERT_VIOLATION at deserialization).
    */
  private val Corrupt = "_graft_corrupt"

  private def parsed[T](df: DataFrame)(implicit enc: Encoder[T]): DataFrame = {
    val fqn = fqnOf[T]
    val pschema = enc.schema.add(Corrupt, StringType)
    df.filter(col("meta.eventType") === fqn)
      .select(col("meta"),
        from_json(col("payload").cast(StringType), pschema,
          Map("columnNameOfCorruptRecord" -> Corrupt)).as("pv"))
  }

  private def okCond[T](implicit enc: Encoder[T]): Column =
    enc.schema.fields.filterNot(_.nullable)
      .map(f => col(s"pv.${f.name}").isNotNull)
      .foldLeft(col("pv").isNotNull && col(s"pv.$Corrupt").isNull)(_ && _)

  private def payloadStruct[T](implicit enc: Encoder[T]): Column =
    struct(enc.schema.fieldNames.toIndexedSeq.map(n => col(s"pv.$n").as(n)): _*)

  /** Typed view of [[decode]] — payload only. Unusable payloads (corrupt
    * JSON or missing non-nullable fields) are DROPPED, matching the
    * reference's resume-on-any-error supervision (KafkaBus.scala:109-112):
    * a poison message must not kill the stream. Route them to an error
    * report via [[decodeFailures]] (F4).
    */
  override def decodeTyped[T](df: DataFrame)(implicit enc: Encoder[T]): Dataset[T] =
    parsed[T](df).where(okCond[T])
      .select(payloadStruct[T].as("value")).select("value.*").as[T]

  /** Typed view of [[decode]] keeping the metadata — the shape the
    * reference's handlers see: `(T, EventMeta)` (reference:
    * bus/package.scala:143-150, handlers are `(T, EventMeta) => Future[U]`).
    * Unusable payloads are dropped (see [[decodeTyped]]).
    */
  override def decodeWithMeta[T](df: DataFrame)
                                (implicit enc: Encoder[T]): Dataset[(T, EventMeta)] = {
    implicit val metaEnc: Encoder[EventMeta] =
      org.apache.spark.sql.Encoders.product[EventMeta]
    implicit val tupleEnc: Encoder[(T, EventMeta)] =
      org.apache.spark.sql.Encoders.tuple(enc, metaEnc)
    parsed[T](df).where(okCond[T])
      .select(payloadStruct[T].as("_1"), col("meta").as("_2"))
      .as[(T, EventMeta)]
  }

  /** F4: the error side-channel — envelopes whose payload failed to
    * deserialize (corrupt JSON or missing non-nullable fields), as
    * `ServiceException` reply envelopes addressed to the failed event
    * (reference: `Publisher.produceErrorReport`, bus/package.scala:93-125
    * — any handler/decode failure becomes a published ServiceException
    * instead of a stream death).
    */
  override def decodeFailures[T](df: DataFrame)(implicit enc: Encoder[T]): DataFrame = {
    val fqn = fqnOf[T]
    val bad = parsed[T](df).where(!okCond[T])
      .withColumn("payload",
        coalesce(col(s"pv.$Corrupt"), lit("<missing non-nullable field>")))
    bad.select(
      struct(
        expr("uuid()").as("eventId"),
        lit(classOf[ServiceException].getName).as("eventType"),
        col("meta.correlationId").as("correlationId"),
        col("meta.trace").as("trace"),
        col("meta.directReply").as("directReply"),
        lit(null).cast(StringType).as("key"),
        col("meta.socketId").as("socketId"),
        col("meta.eventId").as("responseTo"),
        col("meta.extra").as("extra"),
        current_timestamp().as("occurredAt")
      ).as("meta"),
      to_json(struct(
        concat(lit(s"payload for $fqn failed to deserialize: "),
          substring(col("payload").cast(StringType), 1, 256)).as("message"),
        lit("DeserializationException").as("throwableType"),
        array().cast("array<string>").as("stackTrace"),
        map().cast(MapType(StringType, StringType)).as("extra")
      )).cast(BinaryType).as("payload"))
  }

  /** K1+K2 publish routing, computed IN THE PLAN (executor side): every
    * envelope goes to `outTopic`, and replies to RPC requests (responseTo
    * and directReply both present) are additionally copied to the CALLER's
    * service-name topic — the RPC back-channel (reference:
    * KafkaBus.scala:60,64-73; TestBus.scala:126-129). One narrow
    * `explode` over a conditional topic array: no shuffle, no driver
    * collection, and the output shape (`topic`, `meta`, `payload`) is what
    * a Kafka sink consumes directly. At 100 TB this is the publish path —
    * the per-row fan-out stays inside whole-stage codegen.
    */
  def routeToTopics(outTopic: String, envelopes: DataFrame): DataFrame = {
    val topics =
      when(col("meta.responseTo").isNotNull && col("meta.directReply").isNotNull,
        array(lit(outTopic), col("meta.directReply.service")))
      .otherwise(array(lit(outTopic)))
    envelopes.select(explode(topics).as("topic"), col("meta"), col("payload"))
  }

  /** Build REPLY envelopes from `(U, inputMeta)` pairs — the reference's
    * replyAndCommit enrichment (KafkaBus.scala:136-182): fresh eventId,
    * eventType = U's FQN, `responseTo = in.eventId`, correlationId /
    * trace / directReply / extra threaded from the input meta, occurredAt
    * = now. This is what closes the RPC loop: [[graft.rpc.Rpc.correlate]]
    * joins `request.eventId === reply.responseTo`.
    */
  override def encodeReply[U](ds: Dataset[(U, EventMeta)], keyExpr: Option[Column])
                             (implicit enc: Encoder[U]): DataFrame = {
    val fqn = fqnOf[U]
    // payload columns top-level (so keyExpr written against U's fields
    // resolves), input meta tucked under a reserved name
    val flat = ds.toDF().select(col("_2").as("__in_meta"), col("_1.*"))
    val payloadCols = flat.columns.filter(_ != "__in_meta").map(col).toIndexedSeq
    flat.select(
      struct(
        expr("uuid()").as("eventId"),
        lit(fqn).as("eventType"),
        col("__in_meta.correlationId").as("correlationId"),
        col("__in_meta.trace").as("trace"),
        col("__in_meta.directReply").as("directReply"),
        keyExpr.map(_.cast(StringType)).getOrElse(lit(null).cast(StringType)).as("key"),
        col("__in_meta.socketId").as("socketId"),
        col("__in_meta.eventId").as("responseTo"),
        col("__in_meta.extra").as("extra"),
        current_timestamp().as("occurredAt")
      ).as("meta"),
      to_json(struct(payloadCols: _*)).cast(BinaryType).as("payload")
    )
  }
}
