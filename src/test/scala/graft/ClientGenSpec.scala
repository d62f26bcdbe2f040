package graft

import graft.gen.ClientGen
import graft.service.{ServiceDescriptor, ServiceMethod}
import org.scalatest.funsuite.AnyFunSuite

/** C3 generator contract: the committed example stub — which COMPILES as
  * part of this build, typed against the real Client API — must be
  * byte-identical generator output. A generator change that would emit
  * different (possibly non-compiling) source fails here until the
  * example is regenerated and compiles again.
  */
class ClientGenSpec extends AnyFunSuite {

  private val desc = ServiceDescriptor(
    service = "pinger",
    serviceId = "test-id",
    upTime = new java.sql.Timestamp(0L),
    serviceMethods = Seq(ServiceMethod("graft.examples.Ping", "graft.examples.Pong")),
    types = Map.empty)

  test("generated client source is exactly the committed, compiling example stub") {
    val want = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/examples/PingerClient.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val got = ClientGen.clientSource(desc, "graft.examples")
    assert(got === want)
  }

  test("generated DATA source is exactly the committed, compiling example file") {
    import org.apache.spark.sql.Encoders
    val withTypes = desc.copy(types = Map(
      "graft.examples.Ping" -> Encoders.product[graft.examples.Ping].schema.json,
      "graft.examples.Pong" -> Encoders.product[graft.examples.Pong].schema.json))
    val want = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/examples/PingerData.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val got = ClientGen.dataSource(withTypes, "graft.examples.gen")
    assert(got === want)
  }

  test("data generation: Option only for nullable primitives; nested structs named <Outer><Field>") {
    import org.apache.spark.sql.Encoders
    val d = desc.copy(types = Map(
      "graft.RichEvent" -> Encoders.product[RichEvent].schema.json))
    val src = ClientGen.dataSource(d, "g")
    assert(src.contains(
      "final case class RichEvent(id: Long, name: String, note: String, " +
        "at: java.sql.Timestamp, attrs: Map[String, String], inner: RichEventInner)"),
      src)
    // Inner.y is Option[Double] -> nullable double -> Option round-trips;
    // Inner.x is Int (non-nullable) -> Int
    assert(src.contains("final case class RichEventInner(x: Int, y: Option[Double])"), src)
  }

  test("one call + one replies method per service method") {
    val multi = desc.copy(serviceMethods = Seq(
      ServiceMethod("graft.examples.Ping", "graft.examples.Pong"),
      ServiceMethod("graft.GetUser", "graft.UserState")))
    val src = ClientGen.clientSource(multi, "graft.generated")
    assert(src.contains("def ping(") && src.contains("def pingReplies("))
    assert(src.contains("def getUser(") && src.contains("def getUserReplies("))
    assert(src.contains("class PingerClient"))
  }
}
