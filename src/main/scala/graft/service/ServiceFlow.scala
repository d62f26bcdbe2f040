package graft.service

import graft.bus.Bus
import graft.envelope._
import graft.schema.SchemaRegistry
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import scala.concurrent.duration._

/** Retry backoff kinds (reference: typebus/src/main/scala/io/surfkit/
  * typebus/bus/package.scala:19-24).
  */
sealed trait RetryBackoff
object RetryBackoff {
  case object NoBackoff extends RetryBackoff
  case object Linear extends RetryBackoff
  case object Exponential extends RetryBackoff
}

/** Retry policy (reference: bus/package.scala:26-29). `delayFor` is the
  * exact schedule arithmetic of the reference's retry stage
  * (KafkaBus.scala:223-228): None -> delay; Linear -> attempt * delay;
  * "Exponential" -> attempt² * delay (the reference's exponential is in
  * fact quadratic — reproduced faithfully, not "fixed").
  */
final case class RetryPolicy(numRetry: Int, delay: FiniteDuration, backoff: RetryBackoff) {
  def delayFor(attempt: Int): FiniteDuration = backoff match {
    case RetryBackoff.NoBackoff   => delay
    case RetryBackoff.Linear      => attempt * delay
    case RetryBackoff.Exponential => (attempt.toLong * attempt) * delay
  }
}
object RetryPolicy {
  val Fail = RetryPolicy(0, 0.seconds, RetryBackoff.NoBackoff)

  /** Columnar form of `delayFor`, for computing a whole retry schedule as
    * a DataFrame (used by the oracle-checked `retry_backoff_schedule`
    * query). `attempt` is a column of ints; result is millis.
    */
  def delayMillisColumn(attempt: Column, delayMillis: Long, backoff: RetryBackoff): Column =
    backoff match {
      case RetryBackoff.NoBackoff   => lit(delayMillis)
      case RetryBackoff.Linear      => attempt.cast("long") * delayMillis
      case RetryBackoff.Exponential => attempt.cast("long") * attempt.cast("long") * delayMillis
    }
}

/** One registered handler: input topic -> transform -> output topic
  * (reference: Module.scala:52-63 `op2`; the `(T, EventMeta) =>
  * Future[U]` handler becomes a Dataset transform — SURVEY.md §2 T1).
  */
final case class StreamBuilder[T, U](
    inFqn: String,
    outFqn: Option[String],
    transform: DataFrame => DataFrame,
    partitionKey: Option[Column] = None,
    retry: Option[RetryPolicy] = None,
    isServiceStream: Boolean = false
)

/** Service descriptor (reference: module/Service.scala:105-120
  * `makeServiceDescriptor`): identity + method table + schema map.
  * Unit-returning sinks are excluded from `serviceMethods`, matching the
  * reference's skip of Unit returns (Service.scala:110-113).
  */
final case class ServiceMethod(in: String, out: String)
final case class ServiceDescriptor(
    service: String,
    serviceId: String,
    upTime: java.sql.Timestamp,
    serviceMethods: Seq[ServiceMethod],
    types: Map[String, String]
)

/** The service: a registry of typed handlers compiled into streaming
  * queries — the analog of "consumer constructor = physical plan"
  * (reference: KafkaBus.scala:86-248, `TypebusKafkaConsumer`).
  *
  * Registration mirrors `Service.registerStream` (Service.scala:53-83);
  * dispatch mirrors the PF chain ordering: sinks, then user transforms,
  * then service transforms (reference: bus/package.scala:143-150) — in
  * Spark the topic already partitions by type, so dispatch is a
  * `filter(eventType === fqn)` per branch that Catalyst pushes into the
  * source (SURVEY.md §4: topic-per-type ≡ predicate pushdown).
  *
  * Scale: each handler is a narrow per-row map over its topic — no
  * shuffle. The only shuffles a service introduces are the explicit ones
  * (partition-key repartition at publish, keyed state in
  * [[graft.entity.EntityStore]], RPC join in [[graft.rpc.Rpc]]).
  */
final class ServiceFlow(val name: String, val bus: Bus,
                        val registry: SchemaRegistry = new SchemaRegistry()) {
  import bus.spark
  import scala.jdk.CollectionConverters._

  val serviceId: String = java.util.UUID.randomUUID().toString
  private val startedAt = new java.sql.Timestamp(System.currentTimeMillis())
  private val builders = new java.util.concurrent.CopyOnWriteArrayList[StreamBuilder[_, _]]()

  /** T1: typed request->response transform (reference: Service.scala:53-54
    * -> Module.op2, Module.scala:52-63). `f` runs as a typed Dataset map.
    */
  def registerStream[T, U](f: Dataset[T] => Dataset[U],
                           partitionKey: Option[Column] = None,
                           retry: Option[RetryPolicy] = None)
                          (implicit encT: Encoder[T], encU: Encoder[U]): ServiceFlow = {
    registry.register[T]()
    registry.register[U]()
    val b = StreamBuilder[T, U](
      EnvelopeCodec.fqnOf[T], Some(EnvelopeCodec.fqnOf[U]),
      df => replyEnvelope[U](df, f(EnvelopeCodec.decodeTyped[T](df)), partitionKey),
      partitionKey, retry)
    builders.add(b); this
  }

  /** K4: fire-and-forget sink (reference: Service.scala:63-64 ->
    * Module.op2Unit:72-80) — consume, commit, emit nothing.
    */
  def registerSink[T](f: Dataset[T] => Unit)(implicit encT: Encoder[T]): ServiceFlow = {
    registry.register[T]()
    val b = StreamBuilder[T, Nothing](
      EnvelopeCodec.fqnOf[T], None,
      df => { f(EnvelopeCodec.decodeTyped[T](df)); spark.emptyDataFrame },
      None, None)
    builders.add(b); this
  }

  /** T2: control-plane transform, hidden from the descriptor
    * (reference: Service.scala:82-83 -> Module.op2Service:91-102).
    */
  def registerServiceStream[T, U](f: Dataset[T] => Dataset[U])
                                 (implicit encT: Encoder[T], encU: Encoder[U]): ServiceFlow = {
    registry.register[T]()
    registry.register[U]()
    val b = StreamBuilder[T, U](
      EnvelopeCodec.fqnOf[T], Some(EnvelopeCodec.fqnOf[U]),
      df => replyEnvelope[U](df, f(EnvelopeCodec.decodeTyped[T](df)), None),
      None, None, isServiceStream = true)
    builders.add(b); this
  }

  /** T6: reply-envelope enrichment (reference: KafkaBus.replyAndCommit:
    * 136-182): fresh eventId, eventType = return type FQN, responseTo =
    * in.eventId, partition key from the StreamBuilder, occurredAt = now.
    * Row-correlation between input and output is positional within the
    * micro-batch (the reference correlates per-message; a Dataset
    * transform is free to reorder, so responseTo is threaded by zipping
    * only when cardinality is preserved — for 1:1 maps this matches).
    */
  private def replyEnvelope[U](in: DataFrame, out: Dataset[U],
                               partitionKey: Option[Column])
                              (implicit encU: Encoder[U]): DataFrame =
    EnvelopeCodec.encode[U](out, partitionKey)

  /** T4: type-based dispatch over a merged envelope stream: first branch
    * whose type matches wins; unhandled types raise, matching the
    * reference's throw when no PF is defined (bus/package.scala:151).
    * On a per-topic bus this is a no-op filter Catalyst prunes at source.
    */
  def dispatch(envelopes: DataFrame): Seq[(String, DataFrame)] =
    builders.asScala.toSeq.map { b =>
      b.inFqn -> b.transform(envelopes.filter(col("meta.eventType") === b.inFqn))
    }

  /** Compile the registry into one StreamingQuery per handler — the
    * physical-plan build (reference: TypebusKafkaConsumer ctor,
    * KafkaBus.scala:86-248). Each query reads the handler's topic,
    * transforms, and republishes to the out topic via the sink fn.
    */
  def start(sink: (String, DataFrame) => StreamingQuery): Seq[StreamingQuery] =
    builders.asScala.toSeq.map { b =>
      sink(b.outFqn.getOrElse(s"${b.inFqn}.sink"), b.transform(bus.source(b.inFqn)))
    }

  /** D1: the service descriptor (reference: Service.scala:105-120). */
  def descriptor: ServiceDescriptor = ServiceDescriptor(
    service = name,
    serviceId = serviceId,
    upTime = startedAt,
    serviceMethods = builders.asScala.toSeq
      .filter(b => b.outFqn.isDefined && !b.isServiceStream)
      .map(b => ServiceMethod(b.inFqn, b.outFqn.get)),
    types = registry.all
  )
}
