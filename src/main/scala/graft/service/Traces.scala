package graft.service

import graft.envelope.EnvelopeCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, MapType, StringType}

/** O1/O2: observability side-channels.
  *
  * Trace emission (reference: bus/package.scala:66-90 `Publisher.trace`):
  * when the service traces (`busTrace`) or the event opts in
  * (`meta.trace`), every consumed/produced/errored envelope is wrapped in
  * an `InEventTrace`/`OutEventTrace`/`ExceptionTrace` event and published.
  * The reference suppresses self-traces (tracing the trace topic);
  * [[Traces.sideOutput]] reproduces that guard.
  *
  * Heartbeat (reference: event/package.scala:173 `Hb(ts)`): a periodic
  * system event; in Spark the rate source IS the scheduler.
  *
  * Scale: the trace stream is a narrow columnar projection of the event
  * stream — no shuffle, no driver round-trip; at 100 TB the trace topic
  * write is the only added cost, and it's gated per-event by `meta.trace`
  * so the default overhead is a codegen'd filter.
  */
object Traces {

  /** Trace payload: which service saw the event + the original envelope
    * (meta as JSON, payload base64) — the columnar rendering of the
    * reference's `InEventTrace(service, event: PublishedEvent)`
    * (event/package.scala:24-45).
    */
  final case class ServiceIdentifier(name: String, id: String)

  val InTrace = "graft.service.InEventTrace"
  val OutTrace = "graft.service.OutEventTrace"
  val ExceptionTrace = "graft.service.ExceptionTrace"

  private val traceTypes = Set(InTrace, OutTrace, ExceptionTrace)

  /** The trace side output for a stream of envelopes: one trace envelope
    * per input envelope that is trace-enabled (service-wide `busTrace` or
    * per-event `meta.trace`, reference: bus/package.scala:69-74), except
    * trace events themselves (self-trace suppression, :68).
    */
  def sideOutput(envelopes: DataFrame, service: ServiceIdentifier,
                 kind: String, busTrace: Boolean = false): DataFrame = {
    require(traceTypes.contains(kind), s"unknown trace kind $kind")
    envelopes
      .where((lit(busTrace) || col("meta.trace")) &&
        !col("meta.eventType").isin(traceTypes.toSeq: _*))
      .select(
        struct(
          expr("uuid()").as("eventId"),
          lit(kind).as("eventType"),
          col("meta.correlationId").as("correlationId"),
          lit(false).as("trace"), // self-trace suppression downstream
          col("meta.directReply").as("directReply"),
          lit(null).cast(StringType).as("key"),
          lit(null).cast(StringType).as("socketId"),
          col("meta.eventId").as("responseTo"),
          map().cast(MapType(StringType, StringType)).as("extra"),
          current_timestamp().as("occurredAt")
        ).as("meta"),
        to_json(struct(
          struct(lit(service.name).as("name"), lit(service.id).as("id")).as("service"),
          to_json(col("meta")).as("eventMeta"),
          base64(col("payload")).as("eventPayload")
        )).cast(BinaryType).as("payload"))
  }

  /** O2: heartbeat stream — `Hb(ts)` events on a fixed cadence from the
    * rate source (the Structured Streaming scheduler; reference:
    * event/package.scala:173, serde Mapper.scala:98-99).
    *
    * NOTE: the rate source always has more data, so
    * `StreamingQuery.processAllAvailable()` blocks indefinitely on a
    * heartbeat query — poll the sink instead.
    */
  final case class Hb(ts: Long)

  def heartbeat(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame = {
    val hb = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(unix_millis(col("timestamp")).as("ts"))
    hb.select(
      struct(
        expr("uuid()").as("eventId"),
        lit(classOf[Hb].getName).as("eventType"),
        lit(null).cast(StringType).as("correlationId"),
        lit(false).as("trace"),
        lit(null).cast(EnvelopeCodec.metaSchema("directReply").dataType).as("directReply"),
        lit(null).cast(StringType).as("key"),
        lit(null).cast(StringType).as("socketId"),
        lit(null).cast(StringType).as("responseTo"),
        map().cast(MapType(StringType, StringType)).as("extra"),
        timestamp_millis(col("ts")).as("occurredAt")
      ).as("meta"),
      to_json(struct(col("ts"))).cast(BinaryType).as("payload"))
  }
}
