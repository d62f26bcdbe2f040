package graft

import graft.envelope._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Envelope encode/decode round-trips, including the ADVICE-flagged cases:
  * Option fields, Timestamp, nested products, maps.
  */
class EnvelopeCodecSpec extends SparkSpec {
  import spark.implicits._

  private val rich = Seq(
    RichEvent(1L, "a", Some("note"), java.sql.Timestamp.valueOf("2024-01-02 03:04:05.678"),
      Map("k" -> "v"), Inner(7, Some(1.5))),
    RichEvent(2L, "b \"quoted\" \\slash", None, java.sql.Timestamp.valueOf("2024-06-07 08:09:10"),
      Map.empty, Inner(8, None))
  )

  test("encode/decode round-trips Option, Timestamp, Map, nested product") {
    val ds = spark.createDataset(rich)
    val env = EnvelopeCodec.encode(ds)
    val back = EnvelopeCodec.decodeTyped[RichEvent](env).collect().sortBy(_.id)
    assert(back.toSeq === rich)
  }

  test("encode stamps eventType = FQN and fresh eventIds") {
    val env = EnvelopeCodec.encode(spark.createDataset(rich)).cache()
    val types = env.select($"meta.eventType").as[String].collect().distinct
    assert(types === Array(classOf[RichEvent].getName))
    val ids = env.select($"meta.eventId").as[String].collect()
    assert(ids.distinct.length === 2)
  }

  test("decodeWithMeta pairs each payload with its own meta") {
    val ds = spark.createDataset(Seq(Ping(1, "x"), Ping(2, "y")))
    val env = EnvelopeCodec.encode(ds, keyExpr = Some(col("tag")))
    val pairs = EnvelopeCodec.decodeWithMeta[Ping](env).collect().sortBy(_._1.n)
    assert(pairs.map(_._1).toSeq === Seq(Ping(1, "x"), Ping(2, "y")))
    assert(pairs.map(_._2.key).toSeq === Seq(Some("x"), Some("y")))
  }

  test("encodeReply threads responseTo and correlationId from the input meta") {
    implicit val metaEnc = Encoders.product[EventMeta]
    implicit val tupleEnc = Encoders.tuple(Encoders.product[Pong], metaEnc)
    val inMeta = EventMeta(
      eventId = "req-42", eventType = "graft.Ping",
      correlationId = Some("corr-7"), trace = true,
      directReply = Some(RpcClient("", "caller-svc")),
      occurredAt = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val replies = EnvelopeCodec.encodeReply(
      spark.createDataset(Seq((Pong(4, "x"), inMeta))))
    val m = replies.select($"meta.responseTo", $"meta.correlationId",
      $"meta.eventType", $"meta.trace", $"meta.directReply.service").collect().head
    assert(m.getString(0) === "req-42")
    assert(m.getString(1) === "corr-7")
    assert(m.getString(2) === classOf[Pong].getName)
    assert(m.getBoolean(3) === true)
    assert(m.getString(4) === "caller-svc")
    // and the payload survives
    val p = EnvelopeCodec.decodeTyped[Pong](replies).collect().head
    assert(p === Pong(4, "x"))
  }
}
