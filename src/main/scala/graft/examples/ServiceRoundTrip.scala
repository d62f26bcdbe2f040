package graft.examples

import graft.bus.MemoryBus
import graft.envelope._
import graft.rpc.Rpc
import graft.schema.SchemaRegistry
import graft.service.ServiceFlow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the service layer over the in-memory bus —
  * the reference's testkit scenario (TestBus.scala) as one program:
  *
  *   client publishes Ping  →  service handler (Ping, meta) => Pong
  *   →  reply envelope (responseTo = request eventId, correlationId
  *   threaded)  →  RPC correlation join closes the round trip.
  *
  * Run: sbt "runMain graft.examples.ServiceRoundTrip"
  */
final case class Ping(n: Int, from: String)
final case class Pong(doubled: Int, from: String)

object ServiceRoundTrip {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bus = new MemoryBus(spark)
    // Avro-binary wire format — the reference's default serde
    // (Mapper.scala:11-121); swap for EnvelopeCodec to run JSON-in-binary
    val flow = new ServiceFlow("pingpong-svc", bus,
      new SchemaRegistry(), AvroPayloadCodec)
    flow.registerStream[Ping, Pong]((p, _) => Pong(p.n * 2, p.from))

    // RPC caller shape: requests with explicit eventId + correlationId.
    // Capture the request time BEFORE publishing — replies are stamped
    // occurredAt = now() when processed, and the correlation window is
    // [reqTime, reqTime + timeout].
    val reqTime = new java.sql.Timestamp(System.currentTimeMillis())
    val pingFqn = classOf[Ping].getName
    // payloads are real Avro binary (decodable by any stock Avro reader)
    val pingEnc = implicitly[org.apache.spark.sql.Encoder[Ping]]
    val Seq(alice, bob) = AvroPayloadCodec.writeRows(
      Seq(org.apache.spark.sql.Row(21, "alice"), org.apache.spark.sql.Row(100, "bob")),
      pingEnc.schema, pingFqn)
    bus.publishEnvelopes(pingFqn, Seq(
      PublishedEvent(EventMeta(eventId = "req-1", eventType = pingFqn,
        correlationId = Some("corr-A"),
        occurredAt = reqTime), alice),
      PublishedEvent(EventMeta(eventId = "req-2", eventType = pingFqn,
        correlationId = None,
        occurredAt = reqTime), bob),
      PublishedEvent(EventMeta(eventId = "req-bad", eventType = pingFqn,
        correlationId = None, occurredAt = reqTime),
        "not avro at all".getBytes("UTF-8"))))

    val queries = flow.start { (_, df) =>
      df.writeStream.format("memory").queryName("pong_replies")
        .outputMode("append").start()
    } ++ flow.startErrors { (_, df) =>
      df.writeStream.format("memory").queryName("error_reports")
        .outputMode("append").start()
    }
    queries.foreach(_.processAllAvailable())

    println("== error reports (poison message -> ServiceException, stream stays up) ==")
    spark.table("error_reports")
      .select($"meta.responseTo", $"meta.eventType", $"payload".cast("string").as("payload"))
      .show(truncate = false)

    println("== reply envelopes (payload = Avro binary, shown decoded) ==")
    val replies = spark.table("pong_replies")
    replies.select($"meta.responseTo", $"meta.correlationId",
        $"meta.eventType", lower(hex($"payload")).as("payload_hex"))
      .orderBy($"meta.responseTo")
      .show(truncate = false)

    // close the loop: the correlation join a caller would run
    println("== RPC correlation (request.eventId == reply.responseTo) ==")
    val requests = Seq(("req-1", reqTime), ("req-2", reqTime), ("req-orphan", reqTime))
      .toDF("req_id", "req_ts")
    val pongs = AvroPayloadCodec.decodeWithMeta[Pong](replies).toDF()
      .select($"_2.responseTo".as("resp_to"), $"_2.eventId".as("resp_id"),
        $"_2.occurredAt".as("resp_ts"),
        concat(lit("Pong("), $"_1.doubled", lit(","), $"_1.from", lit(")")).as("resp_payload"))
    val resp = pongs
    Rpc.correlate(requests, col("req_id"), col("req_ts"),
        resp, col("resp_to"), col("resp_ts"), col("resp_id"),
        expr("INTERVAL 60 SECONDS"))
      .select($"req_id", $"resp_payload",
        when($"resp_id".isNull, "AskTimeoutException").otherwise("ok").as("status"))
      .orderBy($"req_id")
      .show(truncate = false)

    queries.foreach(_.stop())
    spark.stop()
  }
}
