package graft

import graft.ops.PortableHash
import org.apache.spark.sql.functions._

/** The portable hash must produce the same value from the Spark SQL
  * fragment and the JVM reference fold — including non-ASCII text, which
  * is where round 1's ascii()-based fold silently diverged.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  private def sparkHashOf(s: String): Long =
    Seq(s).toDF("s").select(expr(PortableHash.sparkStringHash("s")))
      .as[Long].head()

  test("spark fragment matches JVM fold on ASCII") {
    for (s <- Seq("a", "ab", "hello world", "the quick brown fox", "0123"))
      assert(sparkHashOf(s) === PortableHash.jvmStringHash(s), s"for '$s'")
  }

  test("spark fragment matches JVM fold on non-ASCII (UTF-8 bytes)") {
    for (s <- Seq("héllo", "中文文本", "naïve café", "日本語 テスト", "emoji 😀"))
      assert(sparkHashOf(s) === PortableHash.jvmStringHash(s), s"for '$s'")
  }

  test("empty string hashes consistently (md5 of empty input)") {
    assert(sparkHashOf("") === PortableHash.jvmStringHash(""))
    assert(PortableHash.jvmStringHash("") < PortableHash.P)
  }

  test("distinct non-ASCII strings do not collide (the ascii() failure mode)") {
    // with ascii(), every non-ASCII char hashed as '?' — these collided
    assert(sparkHashOf("中") !== sparkHashOf("文"))
  }

  test("universal hash family is pure arithmetic") {
    val h = 12345L
    val expected = (37L + 61L * 3) * h + (101L + 97L * 3)
    assert(Seq(1).toDF("x").select(expr(PortableHash.universal(3, h.toString)))
      .as[Long].head() === expected % PortableHash.P)
  }
}
