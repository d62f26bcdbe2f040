package graft.bus

import graft.envelope._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The pluggable bus abstraction (reference: typebus/src/main/scala/io/
  * surfkit/typebus/bus/package.scala — `Publisher`/`Consumer`).
  *
  * One topic ≡ one payload type ≡ one stream (reference:
  * KafkaBus.scala:63,69 — topic name is the payload FQN). In Spark, a
  * topic is a streaming `DataFrame` of envelope rows; `source` is the
  * consumer side, `publish` the producer side.
  *
  * Implementations:
  *  - [[MemoryBus]] — the testkit analog (reference:
  *    typebus-testkit/src/main/scala/io/surfkit/typebus/bus/testkit/
  *    TestBus.scala:27-169), built on `MemoryStream`.
  *  - A Kafka bus would be `spark.readStream.format("kafka")
  *    .option("subscribe", fqns)` with group-id = service name and
  *    `startingOffsets=latest` (reference: KafkaBus.scala:114-121,191-245)
  *    and a `writeStream.format("kafka")` sink with a `topic` column =
  *    payload FQN and `key` = partition key (KafkaBus.scala:56-80). The
  *    build image ships no spark-kafka connector jar, so that impl is not
  *    compiled here; MemoryBus exercises identical logical semantics.
  */
trait Bus {
  def spark: SparkSession

  /** Producer side: wrap and publish a typed batch to the type's topic
    * (reference: bus/package.scala:52-60 `Publisher.publish[T]`).
    */
  def publish[T: Encoder](events: Seq[T], key: Option[T => String] = None): Unit

  /** Publish pre-built envelopes (reference: `publish(event: PublishedEvent)`,
    * KafkaBus.scala:56-80) — used for RPC replies where meta is enriched.
    */
  def publishEnvelopes(topic: String, events: Seq[PublishedEvent]): Unit

  /** Consumer side: the streaming DataFrame of envelope rows for a topic
    * (reference: KafkaBus.scala:191-192 committable source per topic).
    */
  def source(topic: String): DataFrame

  /** All topics ever published/subscribed. */
  def topics: Set[String]

  /** Serialize a typed batch to wire payloads THROUGH THE ENGINE — the
    * same `to_json(struct(...))` path [[graft.envelope.EnvelopeCodec.encode]]
    * uses, so driver-built envelopes (RPC clients, testkit publishes) are
    * byte-identical to columnar-built ones for every encodable type.
    */
  def encodePayloads[T](events: Seq[T])(implicit enc: Encoder[T]): Seq[Array[Byte]] = {
    val ds = spark.createDataset(events)(enc)
    ds.select(to_json(struct(ds.columns.toIndexedSeq.map(col): _*)).as("j"))
      .collect().map(_.getString(0).getBytes("UTF-8")).toSeq
  }
}

/** In-memory bus over `MemoryStream` — the Structured Streaming analog of
  * the reference's `TestBus` (TestBus.scala:27-169): same
  * publish/subscribe/RPC-reply semantics, no broker, for tests.
  *
  * Each topic is its own `MemoryStream[PublishedEvent]`; `addData` is the
  * producer network hop. At-least-once + ordering semantics match the
  * reference's per-partition Kafka ordering (stronger, single partition).
  */
final class MemoryBus(val spark: SparkSession) extends Bus {
  import spark.implicits._

  private val streams =
    scala.collection.concurrent.TrieMap.empty[String, MemoryStream[PublishedEvent]]

  private def streamFor(topic: String): MemoryStream[PublishedEvent] =
    streams.getOrElseUpdate(topic,
      MemoryStream[PublishedEvent](implicitly[org.apache.spark.sql.Encoder[PublishedEvent]],
        spark.sqlContext))

  def publish[T](events: Seq[T], key: Option[T => String] = None)
                (implicit enc: Encoder[T]): Unit = {
    val fqn = EnvelopeCodec.fqnOf[T]
    val payloads = encodePayloads(events)
    val envs = events.zip(payloads).map { case (e, payload) =>
      PublishedEvent(
        EventMeta(
          eventId = java.util.UUID.randomUUID().toString,
          eventType = fqn,
          key = key.map(f => f(e)),
          occurredAt = new java.sql.Timestamp(System.currentTimeMillis())),
        payload = payload)
    }
    streamFor(fqn).addData(envs)
  }

  def publishEnvelopes(topic: String, events: Seq[PublishedEvent]): Unit =
    streamFor(topic).addData(events)

  def source(topic: String): DataFrame = streamFor(topic).toDF()

  def topics: Set[String] = streams.keySet.toSet

}
