package graft

import graft.rpc.Rpc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class RpcSpec extends SparkSpec {
  import spark.implicits._

  test("batch correlate: first reply within window; unmatched request survives the left join") {
    val req = Seq(
      ("r1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("r2", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"))
    ).toDF("req_id", "req_ts")
    val resp = Seq(
      ("r1", "a1", java.sql.Timestamp.valueOf("2024-01-01 00:00:02")),
      ("r1", "a2", java.sql.Timestamp.valueOf("2024-01-01 00:00:03")),
      ("r2", "late", java.sql.Timestamp.valueOf("2024-01-01 02:00:00")) // past window
    ).toDF("resp_to", "resp_id", "resp_ts")
    val out = Rpc.correlate(req, col("req_id"), col("req_ts"),
        resp, col("resp_to"), col("resp_ts"), col("resp_id"), expr("INTERVAL 4 SECONDS"))
      .groupBy($"req_id").agg(min($"resp_id").as("first"), count($"resp_id").as("n"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq(("r1", Some("a1"), 2L), ("r2", None, 0L)))
  }

  test("streaming correlate joins request/response within the timeout window") {
    implicit val sq = spark.sqlContext
    val reqS = MemoryStream[(String, java.sql.Timestamp)]
    val respS = MemoryStream[(String, String, java.sql.Timestamp)]
    val out = Rpc.correlateStreaming(
      reqS.toDF().toDF("reqId", "reqTime"),
      respS.toDF().toDF("respTo", "respId", "respTime"),
      timeout = "4 seconds", watermarkDelay = "2 seconds")
    val q = out.writeStream.format("memory").queryName("rpc_stream")
      .outputMode("append").start()
    try {
      reqS.addData(("r1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      respS.addData(("r1", "ok-1", java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      q.processAllAvailable()
      // advance both watermarks far past the window so the matched row is final
      reqS.addData(("r-flush", java.sql.Timestamp.valueOf("2024-01-01 09:00:00")))
      respS.addData(("x", "flush", java.sql.Timestamp.valueOf("2024-01-01 09:00:00")))
      q.processAllAvailable()
      val rows = spark.table("rpc_stream")
        .select($"reqId", $"respId").as[(String, Option[String])].collect().toMap
      assert(rows.get("r1").flatten === Some("ok-1"))
    } finally q.stop()
  }
}
