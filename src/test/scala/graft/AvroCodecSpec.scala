package graft

import graft.bus.MemoryBus
import graft.envelope._
import graft.service.ServiceFlow
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.functions._

/** Avro-binary payload codec ([[AvroPayloadCodec]]): typed round-trips,
  * interoperability with a STOCK Avro reader (proving the bytes are real
  * Avro binary, not JSON in disguise), poison-payload semantics, reply
  * threading, and a full service round-trip over the MemoryBus with the
  * codec plugged into ServiceFlow.
  */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode round-trips Option, Timestamp, Map, nested product") {
    val ts = java.sql.Timestamp.valueOf("2024-05-04 03:02:01.123456")
    val evs = Seq(
      RichEvent(1L, "a", Some("note"), ts, Map("k" -> "v"), Inner(7, Some(1.5))),
      RichEvent(2L, "b", None, ts, Map.empty, Inner(8, None)))
    val env = AvroPayloadCodec.encode(evs.toDS())
    val back = AvroPayloadCodec.decodeTyped[RichEvent](env).collect().sortBy(_.id)
    assert(back.toSeq === evs)
  }

  test("payload bytes decode with a stock GenericDatumReader (real Avro binary)") {
    val evs = Seq(Ping(21, "alice"), Ping(100, "bob"))
    val rows = AvroPayloadCodec.encode(evs.toDS())
      .select(col("payload")).as[Array[Byte]].collect()
    val schema = AvroPayloadCodec.avroSchemaOf(
      implicitly[org.apache.spark.sql.Encoder[Ping]].schema, classOf[Ping].getName)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val decoded = rows.map { bytes =>
      val rec = reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
      (rec.get("n").asInstanceOf[Int], rec.get("tag").toString)
    }.sortBy(_._1)
    assert(decoded.toSeq === Seq((21, "alice"), (100, "bob")))
    // and the schema is a proper record with a nullable-free int field
    assert(schema.getType == Schema.Type.RECORD)
    assert(schema.getField("n").schema().getType == Schema.Type.INT)
  }

  test("schema derivation: Option fields become null unions, nested products records") {
    val schema = AvroPayloadCodec.avroSchemaOf(
      implicitly[org.apache.spark.sql.Encoder[RichEvent]].schema, classOf[RichEvent].getName)
    val note = schema.getField("note").schema()
    assert(note.getType == Schema.Type.UNION &&
      note.getTypes.get(0).getType == Schema.Type.NULL)
    // product fields are nullable in Encoder schemas -> union(null, record)
    val inner = schema.getField("inner").schema()
    assert(inner.getType == Schema.Type.UNION &&
      inner.getTypes.get(1).getType == Schema.Type.RECORD)
    // timestamp carries the micros logical type
    val at = schema.getField("at").schema()
    val atBase = at.getTypes.get(1)
    assert(atBase.getType == Schema.Type.LONG &&
      atBase.getLogicalType.getName == "timestamp-micros")
  }

  test("poison payloads are dropped from the typed view and surface as F4 errors") {
    val good = AvroPayloadCodec.encode(Seq(Ping(1, "ok")).toDS())
    val fqn = classOf[Ping].getName
    val poison = Seq(
      PublishedEvent(EventMeta(eventId = "bad-1", eventType = fqn),
        "definitely not avro".getBytes("UTF-8")))
      .toDS().toDF()
    val env = good.unionByName(poison)
    assert(AvroPayloadCodec.decodeTyped[Ping](env).collect().toSeq === Seq(Ping(1, "ok")))
    val errs = AvroPayloadCodec.decodeFailures[Ping](env).collect()
    assert(errs.length == 1)
    val meta = errs.head.getStruct(0)
    assert(meta.getString(meta.fieldIndex("responseTo")) == "bad-1")
    assert(meta.getString(meta.fieldIndex("eventType")) == classOf[ServiceException].getName)
  }

  test("encodeReply threads responseTo/correlationId and emits decodable Avro") {
    implicit val metaEnc = org.apache.spark.sql.Encoders.product[EventMeta]
    implicit val tup = org.apache.spark.sql.Encoders.tuple(
      implicitly[org.apache.spark.sql.Encoder[Pong]], metaEnc)
    val inMeta = EventMeta(eventId = "req-9", eventType = "x",
      correlationId = Some("corr-7"))
    val env = AvroPayloadCodec.encodeReply(Seq((Pong(42, "t"), inMeta)).toDS())
    val row = env.collect().head
    val meta = row.getStruct(0)
    assert(meta.getString(meta.fieldIndex("responseTo")) == "req-9")
    assert(meta.getString(meta.fieldIndex("correlationId")) == "corr-7")
    assert(AvroPayloadCodec.decodeTyped[Pong](env).collect().toSeq === Seq(Pong(42, "t")))
  }

  test("full Avro RPC loop: client.call -> service -> K2 back-channel -> typed replies") {
    val bus = new MemoryBus(spark)
    val flow = new ServiceFlow("avro-server", bus,
      new graft.schema.SchemaRegistry(), AvroPayloadCodec)
    flow.registerStream[Ping, Pong]((p, _) => Pong(p.n * 2, p.tag))
    val client = new graft.rpc.Client("avro-caller", bus, AvroPayloadCodec)
    val ids = client.call(Seq(Ping(3, "a"), Ping(4, "b")))
    val serverQs = flow.startPublishing()
    val replyQ = client.replies[Pong].toDF()
      .writeStream.format("memory").queryName("avro_client_replies")
      .outputMode("append").start()
    try {
      serverQs.foreach(_.processAllAvailable())
      replyQ.processAllAvailable()
      val got = spark.table("avro_client_replies")
        .select(col("_1.doubled"), col("_2.responseTo"))
        .as[(Int, String)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq === Seq(6, 8))
      assert(got.map(_._2).toSet === ids.toSet)
    } finally { replyQ.stop(); serverQs.foreach(_.stop()) }
  }

  test("service round trip over MemoryBus with the Avro codec plugged in") {
    val bus = new MemoryBus(spark)
    val flow = new ServiceFlow("avro-svc", bus,
      new graft.schema.SchemaRegistry(), AvroPayloadCodec)
    flow.registerStream[Ping, Pong]((p, _) => Pong(p.n * 2, p.tag))
    val fqn = classOf[Ping].getName
    val pingEnc = implicitly[org.apache.spark.sql.Encoder[Ping]]
    val payloads = AvroPayloadCodec.writeRows(
      Seq(org.apache.spark.sql.Row(5, "a"), org.apache.spark.sql.Row(7, "b")),
      pingEnc.schema, fqn)
    bus.publishEnvelopes(fqn, payloads.zipWithIndex.map { case (p, i) =>
      PublishedEvent(EventMeta(eventId = s"r-$i", eventType = fqn), p)
    })
    val qs = flow.start { (_, df) =>
      df.writeStream.format("memory").queryName("avro_replies")
        .outputMode("append").start()
    }
    qs.foreach(_.processAllAvailable())
    val replies = spark.table("avro_replies")
    val pongs = AvroPayloadCodec.decodeWithMeta[Pong](replies)
      .collect().map { case (p, m) => (m.responseTo.orNull, p) }.sortBy(_._1)
    assert(pongs.toSeq === Seq(("r-0", Pong(10, "a")), ("r-1", Pong(14, "b"))))
    qs.foreach(_.stop())
  }
}
