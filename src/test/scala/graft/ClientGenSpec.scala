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
