package graft

import graft.bus.{KafkaBus, MemoryBus}
import graft.envelope._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Kafka bus option CONTRACT and its routing parity with MemoryBus —
  * the strongest executable proof available without a broker or connector
  * jar (the build image ships neither). The option maps are exposed as
  * pure data ([[KafkaBus.sourceOptions]]/[[KafkaBus.sinkOptions]]) and
  * pinned here against the reference semantics (reference:
  * typebus-kafka/.../KafkaBus.scala:114-121 group-id = service name /
  * unique back-channel group; :56-80 per-record topic routing).
  */
class KafkaOptionContractSpec extends SparkSpec {
  import spark.implicits._

  private def bus = new KafkaBus(spark, bootstrapServers = "broker:9092",
    serviceName = "checkout-svc", checkpointRoot = "/tmp/ckpt",
    startingOffsets = "latest")

  test("S1 reader options: group-id = service name, offsets, subscribe per topic") {
    assert(bus.sourceOptions("graft.Ping", bus.dataGroupId) === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "startingOffsets" -> "latest",
      "kafka.group.id" -> "checkout-svc",
      "subscribe" -> "graft.Ping"))
  }

  test("S2 back-channel group ids are service-prefixed and unique per consumer") {
    val b = bus
    val (g1, g2) = (b.backChannelGroupId(), b.backChannelGroupId())
    assert(g1.startsWith("checkout-svc-bc-") && g2.startsWith("checkout-svc-bc-"))
    assert(g1 !== g2, "every back-channel consumer must see every control event")
    assert(b.sourceOptions("t", g1)("kafka.group.id") === g1)
  }

  test("sink options carry the bootstrap servers (checkpoint added per start)") {
    assert(bus.sinkOptions === Map("kafka.bootstrap.servers" -> "broker:9092"))
  }

  test("K1/K2 routing parity: the Kafka wire delivers the same (topic, event, payload) set MemoryBus does") {
    // an envelope mix that exercises both routing rules: an RPC reply
    // (out-topic + caller copy) and a plain publish (out-topic only)
    val mk = (id: String, responseTo: Option[String], reply: Option[RpcClient]) =>
      PublishedEvent(EventMeta(eventId = id, eventType = "graft.Pong",
        responseTo = responseTo, directReply = reply,
        occurredAt = new java.sql.Timestamp(0)), s"""{"id":"$id"}""".getBytes("UTF-8"))
    val envs = Seq(
      mk("r-1", Some("req-1"), Some(RpcClient("", "caller-a"))),
      mk("r-2", None, None))
    val routed = EnvelopeCodec.routeToTopics("graft.Pong", envs.toDS().toDF())

    // Kafka side: the batch wire transform over the routed frame — decode
    // each destination topic's slice back through fromValue (what a
    // consumer of that topic would see)
    val wire = KafkaBus.toValue(routed)
    val kafkaTopics = wire.select("topic").as[String].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val kafkaDelivered = kafkaTopics.keySet.toSeq.flatMap { t =>
      KafkaBus.fromValue(wire.where(col("topic") === t))
        .select(col("meta.eventId"), col("payload").cast("string"))
        .as[(String, String)].collect().toSeq.map((t, _))
    }.toSet

    // MemoryBus side: the same routed frame through the streaming sink
    val mem = new MemoryBus(spark)
    val ms = MemoryStream[TopicEnvelope](
      org.apache.spark.sql.Encoders.product[TopicEnvelope], spark.sqlContext)
    val q = mem.sinkEnvelopes(ms.toDF())
    try {
      ms.addData(routed.as[TopicEnvelope](
        org.apache.spark.sql.Encoders.product[TopicEnvelope]).collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // parity: same destination topics with the same per-topic counts
    assert(kafkaTopics.keySet === Set("graft.Pong", "caller-a"))
    assert(kafkaTopics === Map("graft.Pong" -> 2, "caller-a" -> 1))
    assert(mem.topics === kafkaTopics.keySet)
    val memDelivered = mem.topics.toSeq.flatMap { t =>
      val qn = "kparity_" + t.replaceAll("[^A-Za-z0-9]", "_")
      val mq = mem.source(t).writeStream.format("memory")
        .queryName(qn).outputMode("append").start()
      try { mq.processAllAvailable() } finally mq.stop()
      spark.sql(s"SELECT meta.eventId, cast(payload AS STRING) FROM $qn")
        .as[(String, String)].collect().toSeq.map((t, _))
    }
    assert(memDelivered.map { case (t, p) => (t, p._1) }.sorted ===
      Seq(("caller-a", "r-1"), ("graft.Pong", "r-1"), ("graft.Pong", "r-2")))
    // and the (topic, event, payload) triples that survive the Kafka
    // armor equal the ones MemoryBus hands the consumer
    assert(kafkaDelivered === memDelivered.toSet)
  }
}
