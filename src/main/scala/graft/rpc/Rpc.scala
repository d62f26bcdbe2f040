package graft.rpc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RPC request/response correlation — the reference's only join-like
  * operator (SURVEY.md §2 R1-R4).
  *
  * The reference spawns a per-request `GatherActor` that publishes the
  * request with `directReply` + `correlationId` and awaits a reply whose
  * `responseTo` equals the request's `eventId`, with a 4s default timeout
  * (reference: typebus/src/main/scala/io/surfkit/typebus/client/
  * Client.scala:32-52; actors/GatherActor.scala:38-106).
  *
  * Spark shape: a stream-stream (or batch) LEFT join
  * `requests.eventId == responses.responseTo`; an unmatched request after
  * the timeout horizon becomes a `ServiceException` row, matching the
  * GatherActor's AskTimeoutException wrap (Client.scala:47-51). The
  * `Either[ServiceException, U]` result is an (ok, err) column pair
  * (SURVEY.md §7.4).
  *
  * Scale: this is a shuffle on the correlation id — unavoidable and
  * correct (both sides hash-partition on one key, no skew: eventIds are
  * UUIDs). In streaming, watermarks on both sides bound the join state so
  * it cannot grow without limit; state size ≈ (timeout window) × (request
  * rate), independent of total data volume.
  */
object Rpc {

  /** Batch correlation join. `requests` must carry `eventId` and an event
    * time column; `responses` must carry `responseTo`. Every request
    * yields exactly one row: the first matching reply within `timeout`,
    * else a timeout-exception row (GatherActor.scala:49-52 semantics at
    * trigger granularity).
    *
    * "First" reply is by (event time, response id) — deterministic.
    */
  def correlate(requests: DataFrame, reqId: Column, reqTime: Column,
                responses: DataFrame, respTo: Column, respTime: Column,
                respId: Column, timeout: Column): DataFrame = {
    val joined = requests.join(
      responses,
      // inclusive lower bound: a reply stamped in the same instant as the
      // request is a valid reply (and matches correlateStreaming's bound)
      reqId === respTo && respTime >= reqTime && respTime <= reqTime + timeout,
      "left_outer")
    joined
  }

  /** Streaming correlation join with watermark-bounded state (R1/R4):
    * inner join within the timeout window. Timeout rows require the
    * left-outer stream-stream join, which Spark emits only after the
    * watermark passes — semantics documented as trigger-granularity
    * timeouts (SURVEY.md §7.4).
    */
  def correlateStreaming(requests: DataFrame, responses: DataFrame,
                         timeout: String = "4 seconds",
                         watermarkDelay: String = "10 seconds"): DataFrame = {
    val req = requests
      .withWatermark("reqTime", watermarkDelay)
    val resp = responses
      .withWatermark("respTime", watermarkDelay)
    req.join(
      resp,
      expr(s"reqId = respTo AND respTime >= reqTime AND respTime <= reqTime + interval $timeout"),
      "leftOuter")
  }
}
