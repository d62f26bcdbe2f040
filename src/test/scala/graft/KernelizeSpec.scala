package graft

import graft.plans.KernelizeTextOps

/** The optimizer rule that rewrites idiomatic declarative text scans to
  * the compiled kernels. Installed/removed around each assertion so the
  * kernel-vs-declarative PARITY suites elsewhere keep comparing two
  * genuinely different implementations (a leaked rule would silently
  * turn them into kernel-vs-kernel). Fixtures read the sf0.001 parquet:
  * a local Seq relation is constant-folded by ConvertToLocalRelation
  * BEFORE `experimental.extraOptimizations` run, so the pattern would
  * never reach the rule (the builder-time `GraftExtensions` injection
  * runs inside the main optimizer batches and has no such ordering
  * caveat).
  */
class KernelizeSpec extends SparkSpec {

  private val docs = () => spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .where("doc_id < 40")

  private def withRule[A](f: => A): A = {
    KernelizeTextOps.install(spark)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == KernelizeTextOps)
  }

  test("word-count shape rewrites to graft_word_count; values unchanged") {
    val q = "size(filter(split(text, ' '), w -> w <> '')) AS n"
    val baseline = docs().selectExpr("doc_id", q).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    withRule {
      val df = docs().selectExpr("doc_id", q)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_word_count"),
        s"declarative word count must kernelize:\n$plan")
      assert(!plan.toLowerCase.contains("array_filter") && !plan.contains("ArrayFilter"),
        s"the HOF must be gone:\n$plan")
      val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === baseline, "rewrite must be value-invariant")
      assert(baseline.values.exists(_ > 0), "fixture must carry real words")
    }
  }

  test("token-count shape rewrites to graft_token_count; values unchanged") {
    val q = "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS n"
    val baseline = docs().selectExpr("doc_id", q).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    withRule {
      val df = docs().selectExpr("doc_id", q)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_token_count"),
        s"declarative token count must kernelize:\n$plan")
      val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === baseline)
    }
  }

  test("normalize shape rewrites to graft_lower_collapse; values unchanged incl. unicode case and VT") {
    // fixture variation the corpus lacks: uppercase unicode (lower() is
    // FULL unicode), tabs/newlines/VT, leading/trailing runs
    val fix = () => docs().selectExpr("doc_id",
      "concat('  ÉΣA\tBc', chr(11), '\n ', text, '   ') AS t")
    // SQL-authored fixtures. Spark's SQL string unescaper recognizes
    // \t \n \r but NOT \f (that backslash is silently dropped), so the
    // escape-sequence class needs DOUBLE backslashes in the SQL text to
    // survive unescaping as the regex-escape spelling the rule accepts.
    for ((q, wantVt) <- Seq(
      ("trim(regexp_replace(lower(t), '[ \\\\t\\\\n\\\\r\\\\f]+', ' ')) AS n", false),
      ("trim(regexp_replace(lower(t), '\\\\s+', ' ')) AS n", true))) {
      val baseline = fix().selectExpr("doc_id", q).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      withRule {
        val df = fix().selectExpr("doc_id", q)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("graft_lower_collapse"),
          s"normalize chain must kernelize (vt=$wantVt):\n$plan")
        assert(!plan.contains("regexp_replace"),
          s"the three-op chain must be gone:\n$plan")
        val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got === baseline, s"rewrite must be value-invariant (vt=$wantVt)")
      }
    }
    // DataFrame-API fixture: the literal-control-character spelling of
    // the class (this path has no SQL unescaping layer)
    locally {
      import org.apache.spark.sql.functions.{col, lower, regexp_replace, trim}
      val build = () => fix().select(col("doc_id"),
        trim(regexp_replace(lower(col("t")), "[ \t\n\r\f]+", " ")).as("n"))
      val baseline = build().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      withRule {
        val df = build()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("graft_lower_collapse"),
          s"DataFrame-API literal-control-char class must kernelize:\n$plan")
        val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got === baseline, "rewrite must be value-invariant (API spelling)")
      }
    }
    // NEGATIVE: the single-backslash SQL spelling unescapes to a class
    // containing the LETTER f ('[ <TAB><LF><CR>f]+'); collapsing runs of
    // "f" is different semantics — the rule must refuse it
    withRule {
      val plan = fix().selectExpr("doc_id",
        "trim(regexp_replace(lower(t), '[ \\t\\n\\r\\f]+', ' ')) AS n")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("graft_lower_collapse"),
        s"letter-f class (mis-escaped SQL) must stay declarative:\n$plan")
    }
    // the two ws-class spellings genuinely differ on VT — the fixture
    // plants U+000B, so value-invariance above is not vacuous
    val a = fix().selectExpr("trim(regexp_replace(lower(t), '[ \\\\t\\\\n\\\\r\\\\f]+', ' ')) AS n")
      .limit(1).collect().head.getString(0)
    val b = fix().selectExpr("trim(regexp_replace(lower(t), '\\\\s+', ' ')) AS n")
      .limit(1).collect().head.getString(0)
    assert(a != b, "fixture must distinguish the VT-including class")
  }

  test("conservative match: other separators, predicates, regexes, and legacy-size stay declarative") {
    withRule {
      for (q <- Seq(
        "size(filter(split(text, ','), w -> w <> '')) AS n",        // other separator
        "size(filter(split(text, ' '), w -> w <> 'x')) AS n",       // other predicate
        "size(regexp_extract_all(text, '[a-z]+', 0)) AS n"))        // other regex
      {
        val plan = docs().selectExpr("doc_id", q).queryExecution.executedPlan.toString
        assert(!plan.contains("graft_word_count") && !plan.contains("graft_token_count"),
          s"must NOT rewrite `$q`:\n$plan")
      }
      // legacy size-of-null: size(NULL) = -1 there, the kernels return
      // NULL — the rule must not fire. ANSI mode (this repo's default)
      // forces legacySizeOfNull=false at analysis, so exercising the
      // guard needs BOTH confs flipped for the one analysis
      spark.conf.set("spark.sql.ansi.enabled", "false")
      spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
      try {
        val plan = docs()
          .selectExpr("size(filter(split(text, ' '), w -> w <> '')) AS n")
          .queryExecution.executedPlan.toString
        assert(!plan.contains("graft_word_count"),
          s"legacy size(NULL) = -1 diverges from the kernel's NULL — no rewrite:\n$plan")
      } finally {
        spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
        spark.conf.set("spark.sql.ansi.enabled", "true")
      }
    }
  }

  test("routed-grain construction rewrites to graft_routed_tokens; values unchanged") {
    import graft.ops.TextAnalysis
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // zh-ify every 3rd doc (the queries' fixture recipe) so both
    // routing outcomes carry mass and value-invariance is not vacuous
    val han26 = "的一是不了人我在有他这为之大来以个中上们到说国和地也"
    val fix = () => docs().selectExpr("doc_id",
      s"IF(doc_id % 3 = 0, replace(translate(lower(text), 'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text) AS text")
    for (keep <- Seq(true, false)) {
      val q = TextAnalysis.routedTokensRegex("text", keep) + " AS t"
      val baseline = fix().selectExpr("doc_id", q).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      withRule {
        val df = fix().selectExpr("doc_id", q)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("graft_routed_tokens"),
          s"routed construction (keepEmpties=$keep) must kernelize:\n$plan")
        assert(!plan.contains("regexp_extract_all"),
          s"the regex tokenization must be gone:\n$plan")
        val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        assert(got === baseline, s"rewrite must be value-invariant (keepEmpties=$keep)")
        assert(baseline.values.exists(_.exists(_.length == 1)),
          "fixture must actually route some rows to the codepoint grain")
      }
    }
    // size(<routed, no empties>) folds all the way to the count-only
    // kernel on the optimizer's fixed-point second pass
    withRule {
      val q = s"size(${TextAnalysis.routedTokensRegex("text", keepEmpties = false)}) AS n"
      val baseline = fix().selectExpr("doc_id", q).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val df = fix().selectExpr("doc_id", q)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_word_count"),
        s"size-of-routed must fold to the count kernel:\n$plan")
      assert(!plan.contains("graft_routed_tokens"),
        s"the token-array materialization must be gone:\n$plan")
      val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === baseline, "count fold must be value-invariant")
    }
    // NEGATIVE: a construction over a DIFFERENT char class (user's own
    // ranges = a different grain) must stay declarative
    withRule {
      val other = TextAnalysis.routedTokensRegex("text", keepEmpties = true)
        .replace(TextAnalysis.cjkCharClass, "[\\u3040-\\u30FF]")
      val plan = fix().selectExpr("doc_id", s"$other AS t")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("graft_routed_tokens"),
        s"foreign char class must NOT rewrite:\n$plan")
    }
  }

  test("install is idempotent and removable") {
    KernelizeTextOps.install(spark)
    KernelizeTextOps.install(spark)
    assert(spark.experimental.extraOptimizations.count(_ == KernelizeTextOps) === 1)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == KernelizeTextOps)
    val plan = docs().selectExpr("size(filter(split(text, ' '), w -> w <> '')) AS n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("graft_word_count"), "removed rule must stop firing")
  }
}
