package graft.examples

import graft.bus.MemoryBus
import graft.rpc.Client
import graft.service.{GetServiceDescriptor, ServiceDescriptor, ServiceFlow}
import org.apache.spark.sql.SparkSession

/** Runnable demo of the full RPC caller path (reference: Client.wire +
  * GatherActor, SURVEY.md §3.2) over the in-memory bus:
  *
  *   client.call(Ping…)  →  server handler  →  reply topic (K1) +
  *   caller's service topic (K2 back-channel)  →  client.replies[Pong]
  *
  * plus service discovery: GetServiceDescriptor answered with the
  * method/type table (D2).
  *
  * Run: sbt "runMain graft.examples.RpcClientDemo"
  */
object RpcClientDemo {
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
    val server = new ServiceFlow("math-svc", bus)
    server.registerStream[Ping, Pong]((p, _) => Pong(p.n * 2, p.from))
    server.enableDiscovery()

    val client = new Client("caller-svc", bus)
    val reqIds = client.call(Seq(Ping(21, "alice"), Ping(50, "bob")))
    client.call(Seq(GetServiceDescriptor("math-svc")))
    println(s"published requests: $reqIds")

    val serverQs = server.startPublishing()
    val replyQ = client.replies[Pong].toDF()
      .writeStream.format("memory").queryName("rpc_pongs").outputMode("append").start()
    val descQ = client.replies[ServiceDescriptor].toDF()
      .writeStream.format("memory").queryName("rpc_descs").outputMode("append").start()
    try {
      serverQs.foreach(_.processAllAvailable())
      replyQ.processAllAvailable(); descQ.processAllAvailable()

      println("== typed replies on the caller's topic (K2) ==")
      spark.table("rpc_pongs")
        .select($"_1.doubled", $"_1.from", $"_2.responseTo").show(truncate = false)

      println("== discovery reply (D2) ==")
      spark.table("rpc_descs")
        .selectExpr("_1.service", "_1.serviceMethods", "map_keys(_1.types) AS types")
        .show(truncate = false)
    } finally { (serverQs :+ replyQ :+ descQ).foreach(_.stop()) }
    spark.stop()
  }
}
