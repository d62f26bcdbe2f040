package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** pass@k estimation (round 18) — the sampled-eval metric of the
  * public code-generation benchmarks: each prompt is sampled n times,
  * c samples pass, and the unbiased estimator
  * `pass@k = 1 − C(n−c, k) / C(n, k)` (Chen et al. 2021, the
  * HumanEval estimator — re-listed from the public definition) is
  * averaged over prompts. The training loop reads this per checkpoint
  * before any RL or rejection-sampling round trusts the samples.
  *
  * Fixed-point arithmetic, exact-replay convention: the binomial
  * RATIO is evaluated as the stepwise product
  * `r ← r·(n−c−i) div (n−i)` starting from 10⁶, truncating at each
  * step — truncation is what BOTH engines do on integer division
  * (the round-18 probe), every factor is non-negative in-domain, and
  * the chain is UNROLLED textually into both dialects (k is a
  * build-time parameter), so the oracle replays bit-identically. The
  * stepwise truncation sits within 1 milli of the rational value
  * (spec-pinned against hand-computed fractions); `n − c < k` means
  * every k-subset contains a pass — pass@k = 1000 exactly.
  *
  * A prompt with fewer than k samples cannot answer the k-question
  * and is EXCLUDED from that k's mean (its other ks keep it);
  * `n_prompts` per row makes the denominator auditable.
  *
  * Plan shape: one sample-scan into a prompt-keyed partial-agg
  * exchange (the per-prompt (n, c) frame), a row-local |ks|-struct
  * explode, then the |ks|-row final agg — sample text never moves,
  * and the heavy exchange carries (prompt, n, c) rows only.
  */
object PassAtK {

  /** The unrolled truncating product `10⁶ · Π (num−i)/(den−i)`;
    * `div` is the dialect's integer-division operator.
    */
  private def chain(num: String, den: String, k: Int, div: String): String = {
    var e = "CAST(1000000 AS BIGINT)"
    for (i <- 0 until k) e = s"($e * (($num) - $i) $div (($den) - $i))"
    e
  }

  /** One row per k: qualifying prompt count and mean pass@k in milli. */
  def passAtK(df: DataFrame, prompt: String, passed: String,
              ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 64),
      s"ks must be in [1, 64], got $ks")
    val items = ks.map { k =>
      s"named_struct('k', CAST($k AS BIGINT), 'ok', n >= $k, " +
        s"'p', CAST(IF(n - c < $k, 1000, " +
        s"1000 - ${chain("n - c", "n", k, "div")} div 1000) AS BIGINT))"
    }.mkString("array(", ", ", ")")
    df.groupBy(col(prompt).as("__p"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passed).cast("boolean"), 1L).otherwise(0L)).as("c"))
      .select(explode(expr(items)).as("r"))
      .where(col("r.ok"))
      .groupBy(col("r.k").as("k"))
      .agg(count(lit(1)).as("n_prompts"), sum(col("r.p")).as("__sp"))
      .select(col("k"), col("n_prompts"),
        expr("CAST(__sp div n_prompts AS BIGINT)").as("pass_at_k_milli"))
  }

  /** pass^k (round 19) — the RELIABILITY estimator paired with
    * [[passAtK]] in the public eval recipes: where pass@k asks "does
    * at least one of k samples pass" (the capability question),
    * pass^k asks "do ALL k samples pass" — the number an agent
    * deployment reads, because a user who retries k times experiences
    * pass@k but a pipeline that must succeed every call experiences
    * pass^k. Unbiased estimator `C(c, k) / C(n, k)` =
    * `Π_{i<k} (c−i)/(n−i)`, the SAME unrolled truncating fixed-point
    * chain as pass@k with the complement numerator and no final
    * 1−·; `c < k` means no all-pass k-subset exists — exactly 0.
    * Exclusion and plan shape identical to [[passAtK]] (prompts with
    * n < k drop from that k's mean; one prompt-keyed partial-agg
    * exchange, row-local |ks| explode, |ks|-row final agg).
    */
  def passAllK(df: DataFrame, prompt: String, passed: String,
               ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 64),
      s"ks must be in [1, 64], got $ks")
    val items = ks.map { k =>
      s"named_struct('k', CAST($k AS BIGINT), 'ok', n >= $k, " +
        s"'p', CAST(IF(c < $k, 0, " +
        s"${chain("c", "n", k, "div")} div 1000) AS BIGINT))"
    }.mkString("array(", ", ", ")")
    df.groupBy(col(prompt).as("__p"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passed).cast("boolean"), 1L).otherwise(0L)).as("c"))
      .select(explode(expr(items)).as("r"))
      .where(col("r.ok"))
      .groupBy(col("r.k").as("k"))
      .agg(count(lit(1)).as("n_prompts"), sum(col("r.p")).as("__sp"))
      .select(col("k"), col("n_prompts"),
        expr("CAST(__sp div n_prompts AS BIGINT)").as("pass_all_k_milli"))
  }

  /** DuckDB twin of [[passAllK]]. */
  def passAllKSql(table: String, prompt: String, passed: String,
                  ks: Seq[Int] = Seq(1, 5, 10)): String = {
    val branches = ks.map { k =>
      s"""  SELECT CAST($k AS BIGINT) AS k,
         |    CASE WHEN c < $k THEN 0
         |         ELSE ${chain("c", "n", k, "//")} // 1000
         |    END AS p
         |  FROM per WHERE n >= $k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH per AS (
       |  SELECT $prompt AS p, count(*)::BIGINT AS n,
       |    sum(CASE WHEN $passed THEN 1 ELSE 0 END)::BIGINT AS c
       |  FROM $table GROUP BY 1)
       |SELECT k, count(*) AS n_prompts,
       |  (sum(p) // count(*))::BIGINT AS pass_all_k_milli
       |FROM (
       |$branches)
       |GROUP BY k""".stripMargin
  }

  /** DuckDB twin of [[passAtK]] — one UNION ALL branch per k over the
    * shared per-prompt CTE, the same unrolled truncating chain.
    */
  def passAtKSql(table: String, prompt: String, passed: String,
                 ks: Seq[Int] = Seq(1, 5, 10)): String = {
    val branches = ks.map { k =>
      s"""  SELECT CAST($k AS BIGINT) AS k,
         |    CASE WHEN n - c < $k THEN 1000
         |         ELSE 1000 - ${chain("n - c", "n", k, "//")} // 1000
         |    END AS p
         |  FROM per WHERE n >= $k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH per AS (
       |  SELECT $prompt AS p, count(*)::BIGINT AS n,
       |    sum(CASE WHEN $passed THEN 1 ELSE 0 END)::BIGINT AS c
       |  FROM $table GROUP BY 1)
       |SELECT k, count(*) AS n_prompts,
       |  (sum(p) // count(*))::BIGINT AS pass_at_k_milli
       |FROM (
       |$branches)
       |GROUP BY k""".stripMargin
  }
}
