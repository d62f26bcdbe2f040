package graft

import graft.ops.Canary

/** Pins the canary audit's contract edges: exact substring semantics,
  * the zero-report rung, and the empty-corpus case (sum over zero rows
  * is NULL on both engines — the audit must still report 0, because an
  * all-eaten corpus is exactly the disaster it exists to catch).
  */
class CanarySpec extends SparkSpec {
  import spark.implicits._

  test("canaryScan: exact substring counts; absent canaries report 0") {
    val df = Seq(
      (1L, "clean text CANARY-X more"),
      (2L, "CANARY-X twice in one doc CANARY-X counts once"),
      (3L, "prefix CANARY-XY is a different string"),
      (4L, "nothing here"))
      .toDF("doc_id", "text")
    val m = Canary.canaryScan(df, "text", Seq("CANARY-X", "CANARY-Z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CANARY-XY CONTAINS CANARY-X as a substring — exact-substring
    // semantics count it (canaries are designed with unique suffixes)
    assert(m("CANARY-X") === 3L)
    assert(m("CANARY-Z") === 0L, "absent canary reports 0, not a missing row")
  }

  test("canaryScan: the empty corpus reports 0 per canary, never NULL") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val rows = Canary.canaryScan(empty, "text", Seq("CANARY-A", "CANARY-B"))
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && r.getLong(1) === 0L,
        s"${r.getString(0)}: sum over zero rows must coalesce to 0")
    }
    // twin replay: the SQL twin must agree on the empty corpus
    empty.createOrReplaceTempView("canary_empty_fixture")
    val twin = spark.sql(Canary.canaryScanSql("canary_empty_fixture",
      "text", Seq("CANARY-A", "CANARY-B"))
      .replace("::BIGINT", ""))
      .collect().map(r => r.getString(0) -> r.getAs[Number](1).longValue).toMap
    assert(twin === Map("CANARY-A" -> 0L, "CANARY-B" -> 0L))
  }
}
