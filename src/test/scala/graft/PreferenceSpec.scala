package graft

import graft.ops.Preference

/** Pins the preference-pair (RLHF/DPO) preparation operators: the pair
  * contract (non-empty prompt/chosen/rejected after normalization,
  * chosen ≠ rejected), normalized identity for dedup (case/spacing
  * variants collapse; field boundaries never alias), token margins and
  * the integer-milli report arithmetic.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    // (id, prompt, chosen, rejected)
    (1L, "why is the sky blue", "rayleigh scattering of sunlight", "magic"),
    (2L, "p", "same answer", "same answer"),          // identical raw
    (3L, "p", "Same  Answer ", "same answer"),        // identical NORMALIZED only
    (4L, "p", "an answer", ""),                       // empty rejected
    (5L, "", "an answer", "other"),                   // empty prompt
    (6L, null.asInstanceOf[String], "c words", "r"),  // null prompt
    (7L, "p", "c words here", null.asInstanceOf[String])) // null rejected
    .toDF("doc_id", "prompt", "chosen", "rejected")

  test("pairStats: contract rungs, normalized identity, margins, milli ratio") {
    val m = Preference.pairStats(pairs, "doc_id", "prompt", "chosen", "rejected")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))

    val r1 = m(1L)
    assert(r1.getAs[Boolean]("valid") && !r1.getAs[Boolean]("identical"))
    assert(r1.getAs[Long]("chosen_tokens") === 4L)     // 4 words
    assert(r1.getAs[Long]("rejected_tokens") === 1L)
    assert(r1.getAs[Long]("margin_tokens") === 3L)
    // len_ratio: 31 chars / 5 chars -> 31000 div 5 = 6200
    assert(r1.getAs[Long]("len_ratio_milli") === 6200L)

    assert(m(2L).getAs[Boolean]("identical") && !m(2L).getAs[Boolean]("valid"))
    // case + double-space + trailing space collapse to the same form
    assert(m(3L).getAs[Boolean]("identical") && !m(3L).getAs[Boolean]("valid"),
      "identity must be NORMALIZED, not raw bytes")
    assert(m(3L).getAs[Long]("chosen_chars") === 13L,
      "char masses stay RAW (the normalization is identity-only)")
    assert(!m(4L).getAs[Boolean]("valid"), "empty rejected breaks the contract")
    assert(!m(5L).getAs[Boolean]("valid"), "empty prompt breaks the contract")
    assert(!m(6L).getAs[Boolean]("valid"), "null prompt breaks the contract")
    assert(!m(7L).getAs[Boolean]("valid"), "null rejected breaks the contract")
    assert(m(7L).getAs[Long]("rejected_chars") === 0L,
      "null coalesces to empty, not engine-specific null propagation")
    // empty vs empty counts as identical (zero preference signal)
    assert(m(4L).getAs[Long]("len_ratio_milli") === 9000L,
      "rejected clamps to >= 1 char so the ratio is total")
  }

  test("pairDedup: normalized collapse, null fields, no field-boundary aliasing") {
    val dups = Seq(
      (1L, "a prompt", "b c", "d"),
      (2L, " A  Prompt ", "B  C", "D"),   // same triple after normalization
      (3L, "ab", "c", "d"),               // boundary-aliasing probes:
      (4L, "a", "bc", "d"),               //   ('ab','c') vs ('a','bc')
      (5L, "p", "c", null.asInstanceOf[String]),
      (6L, "p", "c", null.asInstanceOf[String])) // null == null for identity
      .toDF("doc_id", "prompt", "chosen", "rejected")
    val out = Preference.pairDedup(dups, "doc_id", "prompt", "chosen", "rejected")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 2L),
      "normalized variants collapse; shifted field boundaries must NOT")
  }

  test("report: integer-milli fractions and signed margin sums per stratum") {
    val df = Seq(
      (1L, "s1", "p", "two words", "one"),   // valid, margin +1
      (2L, "s1", "p", "x", "x"),             // identical -> invalid
      (3L, "s1", "p", "w", "three word answer"), // valid, margin -2
      (4L, "s2", "", "c", "r"))              // invalid (empty prompt)
      .toDF("doc_id", "src", "prompt", "chosen", "rejected")
    val m = Preference.report(df, "doc_id", "prompt", "chosen", "rejected", "src")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = m("s1")
    assert(s1.getAs[Long]("n_pairs") === 3L)
    assert(s1.getAs[Long]("n_valid") === 2L)
    assert(s1.getAs[Long]("valid_milli") === 666L)
    assert(s1.getAs[Long]("n_identical") === 1L)
    assert(s1.getAs[Long]("sum_margin_tokens") === -1L,
      "margins are SIGNED and summed (never integer-divided)")
    val s2 = m("s2")
    assert(s2.getAs[Long]("n_valid") === 0L && s2.getAs[Long]("valid_milli") === 0L)
  }

  test("dpoMargins: hand-computed milli-nat margins; NULL log-probs out of domain") {
    val df = Seq(
      (1L, Some(-100L), Some(-300L), Some(-900L), Some(-400L)), // (200) - (-500) = 700
      (2L, Some(-500L), Some(-500L), Some(-700L), Some(-700L)), // exact 0
      (3L, None, Some(-100L), Some(-100L), Some(-900L)), // NULL -> dropped
      (4L, Some(-2000L), Some(-100L), Some(-100L), Some(-900L))) // -1900 - 800 = -2700
      .toDF("id", "lpcn", "lpcr", "lprn", "lprr")
    val m = graft.ops.Preference.dpoMargins(df, "id", "lpcn", "lpcr",
      "lprn", "lprr")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 700L, 2L -> 0L, 4L -> -2700L),
      "the NULL-lp pair must be out of domain, not a junk bin")

    val rep = graft.ops.Preference.dpoMarginReport(df, "id", "lpcn",
      "lpcr", "lprn", "lprr")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bins at 500 milli: 700 -> bin 1 (positive), 0 -> bin -1,
    // -2700 -> bin 5 (negative, not chosen-preferred)
    assert(rep === Map(
      -1L -> ((1L, 0L, 0L, 0L)),
      1L -> ((1L, 1L, 1000L, 700L)),
      5L -> ((1L, 0L, 0L, -2700L))))
  }
}
