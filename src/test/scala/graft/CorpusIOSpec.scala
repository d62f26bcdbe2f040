package graft

import graft.ops.CorpusIO
import org.apache.spark.sql.functions._

/** Pins [[graft.ops.CorpusIO]] contracts the checksum oracle can't see:
  * the per-file row bound of the sharded writer (loaders schedule
  * per-file — one monolithic shard defeats the layout) and JSONL
  * byte-exactness on text the sf corpus doesn't contain (embedded
  * newlines, quotes, backslashes, non-BMP unicode).
  */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_iospec_$name"

  test("writeSharded: every output file holds at most maxRecordsPerFile rows") {
    val docs = (1L to 57L).map(i => (i, if (i % 2 == 0) "en" else "fr", s"d$i"))
      .toDF("doc_id", "lang", "text")
    val out = tmp("bound")
    CorpusIO.writeSharded(docs, out, "lang", maxRecordsPerFile = 10)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name()).count().as[(String, Long)].collect()
    assert(perFile.nonEmpty && perFile.forall(_._2 <= 10L),
      s"file row bound violated: ${perFile.toSeq}")
    // partition values survive the directory encoding
    assert(spark.read.parquet(out).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap === Map("en" -> 28L, "fr" -> 29L))
  }

  test("JSONL round-trip is byte-exact on newlines, quotes, and non-BMP text") {
    val nasty = Seq(
      (1L, "line one\nline two\r\nwindows"),
      (2L, "quote \" backslash \\ tab\t"),
      (3L, "中文 и кириллица and 😀 emoji"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = tmp("jsonl")
    CorpusIO.writeJsonl(nasty, out)
    val back = CorpusIO.readJsonl(spark, out, nasty.schema)
    val orig = nasty.as[(Long, String)].collect().toMap
    val got = back.as[(Long, String)].collect().toMap
    assert(got === orig, "every character must survive the round-trip")
  }

  test("checksum: one changed character anywhere changes text_hash_sum") {
    val a = Seq((1L, "g", "hello world"), (2L, "g", "second doc")).toDF("doc_id", "src", "text")
    val b = Seq((1L, "g", "hello w0rld"), (2L, "g", "second doc")).toDF("doc_id", "src", "text")
    val ca = CorpusIO.checksum(a, "src", "doc_id", "text")
      .select($"text_hash_sum").as[Long].head()
    val cb = CorpusIO.checksum(b, "src", "doc_id", "text")
      .select($"text_hash_sum").as[Long].head()
    assert(ca != cb)
  }
}
