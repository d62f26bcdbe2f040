package graft

import graft.bus.KafkaBus
import graft.envelope._
import org.apache.spark.sql.functions._

/** Kafka wire-format transforms ([[KafkaBus.toValue]]/[[fromValue]]) —
  * pure column expressions, so the round-trip is provable batch-side
  * without a broker or connector jar (which the build image does not
  * ship; [[graft.bus.MemoryBus]] is the in-env execution proof of the
  * bus semantics themselves).
  */
class KafkaBusWireSpec extends SparkSpec {
  import spark.implicits._

  private def envelopes() = {
    val ds = Seq(Ping(1, "a"), Ping(2, "b")).toDS()
    EnvelopeCodec.encode(ds, keyExpr = Some(col("tag")))
  }

  test("toValue -> fromValue round-trips meta and payload bytes exactly") {
    val routed = EnvelopeCodec.routeToTopics("t.Ping", envelopes())
    val wire = KafkaBus.toValue(routed)
    assert(wire.columns.toSeq === Seq("topic", "key", "value"))
    val back = KafkaBus.fromValue(wire)
    val orig = routed.select(col("meta.eventId"), col("meta.eventType"),
      col("meta.key"), col("payload").cast("string")).collect().toSet
    val got = back.select(col("meta.eventId"), col("meta.eventType"),
      col("meta.key"), col("payload").cast("string")).collect().toSet
    assert(got === orig)
  }

  test("kafka key column carries the partition key bytes (P1)") {
    val routed = EnvelopeCodec.routeToTopics("t.Ping", envelopes())
    val keys = KafkaBus.toValue(routed)
      .select(col("key").cast("string")).as[String].collect().sorted
    assert(keys.toSeq === Seq("a", "b"))
  }

  test("payloads survive armoring codec-agnostically (Avro bytes too)") {
    val env = AvroPayloadCodec.encode(Seq(Ping(21, "alice")).toDS())
    val routed = EnvelopeCodec.routeToTopics("t.Ping", env)
    val back = KafkaBus.fromValue(KafkaBus.toValue(routed))
    val pings = AvroPayloadCodec.decodeTyped[Ping](back).collect()
    assert(pings.toSeq === Seq(Ping(21, "alice")))
  }
}
