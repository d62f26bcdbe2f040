package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Pins [[Dedup.dedupSpans]]: corpus-duplicated fixed-length word spans
  * are struck at every covered position (overlap union), unique text
  * survives, and a doc of pure boilerplate survives as empty clean_text.
  */
class DedupSpansSpec extends SparkSpec {
  import spark.implicits._

  test("duplicated spans struck at any alignment; unique words survive") {
    val boiler = "one two three four five six"
    // the boilerplate lands at a DIFFERENT word offset in each doc —
    // stride-1 grams must catch it regardless of alignment
    val docs = (0 until 12).map { i =>
      (i.toLong, s"u$i " * (i % 3 + 1) + boiler + s" tail$i")
    }.toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", spanLen = 5, maxFreq = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 12)
    (0 until 12).foreach { i =>
      val expected = (s"u$i " * (i % 3 + 1)).trim + s" tail$i"
      assert(out(i.toLong) === expected, s"doc $i")
    }
  }

  test("a doc of pure boilerplate survives with empty clean_text") {
    val boiler = "a b c d e"
    val docs = ((0 until 11).map(i => (i.toLong, s"x$i $boiler")) :+
      (99L, boiler)).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", spanLen = 5, maxFreq = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pure = out.find(_._1 == 99L).get
    assert(pure._2 === "" && pure._3 === 5L && pure._4 === 5L)
    // the x$i prefix words survive in every other doc
    assert(out.filter(_._1 != 99L).forall { case (i, clean, rem, n) =>
      clean === s"x$i" && rem === 5L && n === 6L
    })
  }
}
