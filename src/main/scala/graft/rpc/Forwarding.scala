package graft.rpc

import graft.envelope.RpcClient
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** R3: forward/delegation — re-publish a request so its reply goes to a
  * DIFFERENT caller, threading correlationId and extra metadata
  * (reference: typebus/src/main/scala/io/surfkit/typebus/client/
  * Forwarding.scala:13-27 — publish T with `directReply` pointing at the
  * delegate, correlationId preserved, extra merged).
  *
  * Pure columnar envelope rewrite: fresh eventId (it is a new publish),
  * same eventType/payload/correlationId, replaced reply address, merged
  * extra. No shuffle.
  */
object Forwarding {

  def forward(envelopes: DataFrame, to: RpcClient,
              extra: Map[String, String] = Map.empty): DataFrame = {
    val extraCol =
      if (extra.isEmpty) col("meta.extra")
      else map_concat(
        coalesce(col("meta.extra"), map().cast(MapType(StringType, StringType))),
        map(extra.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*))
    envelopes.select(
      struct(
        expr("uuid()").as("eventId"),
        col("meta.eventType").as("eventType"),
        col("meta.correlationId").as("correlationId"),
        col("meta.trace").as("trace"),
        struct(lit(to.path).as("path"), lit(to.service).as("service")).as("directReply"),
        col("meta.key").as("key"),
        col("meta.socketId").as("socketId"),
        col("meta.responseTo").as("responseTo"),
        extraCol.as("extra"),
        col("meta.occurredAt").as("occurredAt")
      ).as("meta"),
      col("payload"))
  }
}
