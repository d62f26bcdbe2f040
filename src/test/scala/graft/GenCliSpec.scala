package graft

import graft.gen.DescriptorIO
import graft.service.{ServiceDescriptor, ServiceMethod}
import org.apache.spark.sql.Encoders
import java.nio.file.{Files, Paths}

/** End-to-end C3: persist a descriptor, run the [[graft.tools.Gen]] CLI
  * main against it, and require the emitted files to be byte-identical
  * to the committed, compiling examples — the same golden files
  * ClientGenSpec pins for the in-process API, now reached through the
  * persisted-descriptor + CLI path (reference:
  * cli/CommandParser.scala:56-123).
  */
class GenCliSpec extends SparkSpec {

  private val desc = ServiceDescriptor(
    service = "pinger",
    serviceId = "test-id",
    upTime = new java.sql.Timestamp(0L),
    serviceMethods = Seq(ServiceMethod("graft.examples.Ping", "graft.examples.Pong")),
    types = Map(
      "graft.examples.Ping" -> Encoders.product[graft.examples.Ping].schema.json,
      "graft.examples.Pong" -> Encoders.product[graft.examples.Pong].schema.json))

  test("descriptor JSON round-trips through DescriptorIO") {
    val dir = Files.createTempDirectory("graft_desc").toString
    DescriptorIO.save(spark, desc, s"$dir/desc")
    assert(DescriptorIO.load(spark, s"$dir/desc") === desc)
  }

  test("Gen CLI emits the committed golden client + data sources from a persisted descriptor") {
    val dir = Files.createTempDirectory("graft_gen").toString
    DescriptorIO.save(spark, desc, s"$dir/desc")
    graft.tools.Gen.main(Array(
      s"$dir/desc", s"$dir/out", "graft.examples", "graft.examples.gen"))

    val client = Files.readString(Paths.get(s"$dir/out/PingerClient.scala"))
    val data = Files.readString(Paths.get(s"$dir/out/PingerData.scala"))
    assert(client === Files.readString(
      Paths.get("src/main/scala/graft/examples/PingerClient.scala")))
    assert(data === Files.readString(
      Paths.get("src/main/scala/graft/examples/PingerData.scala")))
    // the CLI must NOT have torn down the session it borrowed
    assert(!spark.sparkContext.isStopped)
  }

  test("Gen CLI skips the data file when the descriptor carries no types") {
    val dir = Files.createTempDirectory("graft_gen_nt").toString
    DescriptorIO.save(spark, desc.copy(types = Map.empty), s"$dir/desc")
    graft.tools.Gen.main(Array(s"$dir/desc", s"$dir/out"))
    assert(Files.exists(Paths.get(s"$dir/out/PingerClient.scala")))
    assert(!Files.exists(Paths.get(s"$dir/out/PingerData.scala")))
  }
}
