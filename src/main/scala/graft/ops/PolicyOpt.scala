package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Policy-optimization data preparation (round 18) — the two
  * sample-grain reports the current public RLHF recipes read before a
  * gradient step.
  *
  * [[grpoAdvantage]]: the group-relative baseline (the GRPO recipe,
  * re-listed from the public description) — each prompt's sampled
  * completions are baselined against their OWN group mean, no value
  * network: `adv = r − mean(group)`. Kept as the exact scaled integer
  * `r·n − Σr` (the [[Trajectory.trajAdvantage]] convention: rewards
  * are signed, and no signed value is ever divided in a hashed
  * column; the trainer normalizes in float downstream, where the
  * per-group std it divides by lives anyway). A single-sample group
  * reports 0 by construction.
  *
  * [[ppoClipStats]]: the clip-fraction report — with log-probabilities
  * in integer MILLI-NATS, the PPO ratio `exp(Δ)` clips at 1±ε exactly
  * when `Δ = lp_new − lp_old` leaves `[ln(1−ε), ln(1+ε)]`, so the
  * clip test is an INTEGER comparison on milli-nat deltas (the
  * epsilon bounds are build-time constants rendered into both
  * dialects; no float exp crosses an engine). Per policy: samples,
  * clipped-above/below counts and the clip fraction in milli — a
  * rising clip fraction is the standard signal the policy has drifted
  * too far off the data-collecting policy for the batch to be useful.
  *
  * Plan shapes: grpo is one prompt-keyed partial-agg exchange joined
  * back to the sample grain by the same key (the baseline frame is
  * |prompts| rows of two longs); ppoClipStats is one scan into a
  * |policies|-row partial-agged exchange — distributive, the
  * complete-mode streaming family.
  *
  * Input domain: rewards and log-probs are INTEGER milli / milli-nats.
  * The twins route every cast through trunc() so a DOUBLE column
  * truncates toward zero like Spark's cast-to-long instead of DuckDB's
  * round-half-even `::BIGINT` (round-18 ADVICE: reward 0.7 was 0 on
  * Spark and 1 on DuckDB); integral inputs are unaffected.
  */
object PolicyOpt {

  /** One row per sample: its reward, group size, and the exact scaled
    * advantage `r·n − Σ_group r`.
    */
  def grpoAdvantage(df: DataFrame, prompt: String, sample: String,
                    reward: String): DataFrame = {
    val base = df.groupBy(col(prompt).as("__p"))
      .agg(count(lit(1)).as("n_group"),
        sum(coalesce(col(reward).cast("long"), lit(0L))).as("__sum"))
    df.select(col(prompt).as("__p"), col(sample).as("sample_id"),
      coalesce(col(reward).cast("long"), lit(0L)).as("reward_milli"))
      .join(base, Seq("__p"))
      .select(col("__p").as("prompt_id"), col("sample_id"),
        col("reward_milli"), col("n_group"),
        (col("reward_milli") * col("n_group") - col("__sum"))
          .as("adv_scaled_milli"))
  }

  /** DuckDB twin of [[grpoAdvantage]]. */
  def grpoAdvantageSql(table: String, prompt: String, sample: String,
                       reward: String): String =
    s"""SELECT s.$prompt AS prompt_id, s.$sample AS sample_id,
       |  ${graft.ops.PortableHash.truncToZero(s"coalesce(s.$reward, 0)")} AS reward_milli,
       |  b.n_group,
       |  (${graft.ops.PortableHash.truncToZero(s"coalesce(s.$reward, 0)")} * b.n_group
       |    - b.rsum)::BIGINT AS adv_scaled_milli
       |FROM $table s
       |JOIN (
       |  SELECT $prompt AS p, count(*) AS n_group,
       |    sum(${graft.ops.PortableHash.truncToZero(s"coalesce($reward, 0)")})::BIGINT AS rsum
       |  FROM $table GROUP BY 1) b
       |ON s.$prompt = b.p""".stripMargin

  /** GRPO group statistics (round 19) — the prompt-grain frame the
    * trainer's normalization actually divides by: GRPO scales each
    * advantage by the group's std, and the exact integer prep is
    * `var_scaled = n·Σr² − (Σr)²` (= n² × the population variance —
    * non-negative by Cauchy-Schwarz, pure products and sums, no
    * division anywhere; the trainer takes `sqrt(var_scaled)/n` in
    * float land where its epsilon-guard lives). One row per prompt
    * with n, Σr and Σr², so [[grpoAdvantage]]'s scaled advantage and
    * this frame share a denominator convention: `adv_scaled = r·n − Σr`
    * normalizes as `adv_scaled / sqrt(var_scaled)`.
    *
    * Range: Σr² needs |r| ≲ 2·10⁶ milli at 10⁶-sample groups to stay
    * inside 64 bits — generous for milli-rewards in [−10⁶, 10⁶].
    * One prompt-keyed partial-agg exchange; distributive, the
    * complete-mode streaming family.
    */
  def grpoGroupStats(df: DataFrame, prompt: String,
                     reward: String): DataFrame =
    df.select(col(prompt).as("prompt_id"),
      coalesce(col(reward).cast("long"), lit(0L)).as("__r"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_group"),
        sum(col("__r")).as("sum_r_milli"),
        sum(col("__r") * col("__r")).as("sum_r2"))
      .withColumn("var_scaled",
        col("n_group") * col("sum_r2") - col("sum_r_milli") * col("sum_r_milli"))

  /** DuckDB twin of [[grpoGroupStats]]. */
  def grpoGroupStatsSql(table: String, prompt: String,
                        reward: String): String =
    s"""SELECT prompt_id, count(*) AS n_group,
       |  sum(r)::BIGINT AS sum_r_milli,
       |  sum(r * r)::BIGINT AS sum_r2,
       |  (count(*) * sum(r * r) - sum(r) * sum(r))::BIGINT AS var_scaled
       |FROM (SELECT $prompt AS prompt_id,
       |        ${graft.ops.PortableHash.truncToZero(s"coalesce($reward, 0)")} AS r
       |      FROM $table)
       |GROUP BY prompt_id""".stripMargin

  /** KL-drift report (round 19) — the other PPO health number next to
    * [[ppoClipStats]]: with per-sample log-probs in integer MILLI-NATS
    * under the old and new policy, the k1 estimator of
    * `KL(π_old ‖ π_new)` on old-policy samples is `mean(lp_old −
    * lp_new)` — kept as the SIGNED SUM plus the count (the repo's
    * no-signed-division rule; the trainer reads sum/n in float), with
    * tail counts at 100/500 milli-nat |Δ| thresholds (integer
    * comparisons) because a healthy mean can hide a divergent tail —
    * the standard early-stop signal reads both. One scan into a
    * |policies|-row partial-agged exchange; distributive.
    */
  def klReport(df: DataFrame, policy: String, lpNew: String,
               lpOld: String): DataFrame =
    df.select(col(policy).as("policy"),
      (col(lpOld).cast("long") - col(lpNew).cast("long")).as("__d"))
      .groupBy(col("policy"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("__d")).as("sum_kl_millinats"),
        sum(when(abs(col("__d")) > 100L, 1L).otherwise(0L))
          .as("n_drift_100"),
        sum(when(abs(col("__d")) > 500L, 1L).otherwise(0L))
          .as("n_drift_500"))

  /** DuckDB twin of [[klReport]]. */
  def klReportSql(table: String, policy: String, lpNew: String,
                  lpOld: String): String =
    s"""SELECT policy, count(*) AS n_samples,
       |  sum(d)::BIGINT AS sum_kl_millinats,
       |  sum(CASE WHEN abs(d) > 100 THEN 1 ELSE 0 END)::BIGINT AS n_drift_100,
       |  sum(CASE WHEN abs(d) > 500 THEN 1 ELSE 0 END)::BIGINT AS n_drift_500
       |FROM (
       |  SELECT $policy AS policy,
       |    ${graft.ops.PortableHash.truncToZero(s"$lpOld")} - ${graft.ops.PortableHash.truncToZero(s"$lpNew")} AS d
       |  FROM $table)
       |GROUP BY policy""".stripMargin

  /** Per-token NLL / perplexity report (round 20) — the eval-loss
    * twin of [[klReport]], the number every training run reads next
    * to KL drift: over step-grain log-probs in integer MILLI-NATS,
    * per policy: in-domain token count, `Σ NLL` milli-nats, mean NLL
    * milli, and tail token counts at the 1000/3000 milli-nat
    * thresholds (a healthy mean hides a divergent tail — a token the
    * model assigns e⁻³ ≈ 5% to is a surprise worth counting). The
    * consumer reads perplexity as `exp(mean/1000)` in float land.
    *
    * Domain: a log-prob is NON-POSITIVE by definition, so `lp > 0`
    * rows are MALFORMED (a broken logging pipeline, not a token) and
    * are counted out into `n_malformed` alongside NULLs rather than
    * silently polluting the loss — which keeps `nll = −lp ≥ 0`, the
    * sum non-negative, and the mean an UNSIGNED truncating division
    * (the repo's no-signed-division rule holds; no kappa-style
    * sanction needed). A policy with zero in-domain tokens reports
    * mean 0 with `n_tokens = 0` visible (the ANSI div-by-zero guard,
    * both dialects). Fractional DOUBLE log-probs truncate toward zero
    * on both sides (Spark cast / twin truncToZero — the round-18
    * ADVICE class).
    *
    * Plan shape: one scan into a |policies|-row partial-agged
    * exchange — distributive, the complete-mode streaming family
    * (same as [[klReport]]; StreamingOpsSpec's complete-mode pin
    * class).
    */
  def nllReport(df: DataFrame, policy: String, lp: String): DataFrame =
    df.select(col(policy).as("policy"), col(lp).cast("long").as("__lp"))
      .groupBy(col("policy"))
      .agg(sum(when(col("__lp") <= 0L, 1L).otherwise(0L)).as("n_tokens"),
        sum(when(col("__lp").isNull || col("__lp") > 0L, 1L).otherwise(0L))
          .as("n_malformed"),
        coalesce(sum(when(col("__lp") <= 0L, -col("__lp"))), lit(0L))
          .as("sum_nll_millinats"),
        sum(when(col("__lp") <= -1000L, 1L).otherwise(0L)).as("n_tail_1000"),
        sum(when(col("__lp") <= -3000L, 1L).otherwise(0L)).as("n_tail_3000"))
      .withColumn("mean_nll_milli",
        expr("IF(n_tokens = 0, cast(0 AS BIGINT), " +
          "cast(sum_nll_millinats div n_tokens AS BIGINT))"))

  /** DuckDB twin of [[nllReport]]. */
  def nllReportSql(table: String, policy: String, lp: String): String =
    s"""SELECT policy,
       |  sum(CASE WHEN l <= 0 THEN 1 ELSE 0 END)::BIGINT AS n_tokens,
       |  sum(CASE WHEN l IS NULL OR l > 0 THEN 1 ELSE 0 END)::BIGINT
       |    AS n_malformed,
       |  coalesce(sum(CASE WHEN l <= 0 THEN -l END), 0)::BIGINT
       |    AS sum_nll_millinats,
       |  sum(CASE WHEN l <= -1000 THEN 1 ELSE 0 END)::BIGINT AS n_tail_1000,
       |  sum(CASE WHEN l <= -3000 THEN 1 ELSE 0 END)::BIGINT AS n_tail_3000,
       |  (CASE WHEN sum(CASE WHEN l <= 0 THEN 1 ELSE 0 END) = 0 THEN 0
       |        ELSE coalesce(sum(CASE WHEN l <= 0 THEN -l END), 0)
       |          // sum(CASE WHEN l <= 0 THEN 1 ELSE 0 END)
       |   END)::BIGINT AS mean_nll_milli
       |FROM (
       |  SELECT $policy AS policy,
       |    ${graft.ops.PortableHash.truncToZero(lp)} AS l
       |  FROM $table)
       |GROUP BY policy""".stripMargin

  /** ln(1±ε) in milli-nats for the standard ε (integer constants both
    * dialects share; ε = 0.2 → [−223, 182]).
    */
  private def bounds(epsMilli: Int): (Long, Long) = {
    val lo = math.round(math.log1p(-epsMilli / 1000.0) * 1000.0)
    val hi = math.round(math.log1p(epsMilli / 1000.0) * 1000.0)
    (lo, hi)
  }

  /** Per policy: sample count, clipped-below/above counts (milli-nat
    * delta outside [ln(1−ε), ln(1+ε)]), and the clip fraction milli.
    */
  def ppoClipStats(df: DataFrame, policy: String, lpNew: String,
                   lpOld: String, epsMilli: Int = 200): DataFrame = {
    val (lo, hi) = bounds(epsMilli)
    df.select(col(policy).as("policy"),
      (col(lpNew).cast("long") - col(lpOld).cast("long")).as("__d"))
      .groupBy(col("policy"))
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("__d") < lo, 1L).otherwise(0L)).as("n_clip_below"),
        sum(when(col("__d") > hi, 1L).otherwise(0L)).as("n_clip_above"))
      .select(col("policy"), col("n_samples"),
        col("n_clip_below"), col("n_clip_above"),
        expr("CAST((n_clip_below + n_clip_above) * 1000 div n_samples AS BIGINT)")
          .as("clip_frac_milli"))
  }

  /** DuckDB twin of [[ppoClipStats]]. */
  def ppoClipStatsSql(table: String, policy: String, lpNew: String,
                      lpOld: String, epsMilli: Int = 200): String = {
    val (lo, hi) = bounds(epsMilli)
    s"""SELECT policy, count(*) AS n_samples,
       |  sum(CASE WHEN d < $lo THEN 1 ELSE 0 END)::BIGINT AS n_clip_below,
       |  sum(CASE WHEN d > $hi THEN 1 ELSE 0 END)::BIGINT AS n_clip_above,
       |  ((sum(CASE WHEN d < $lo THEN 1 ELSE 0 END)
       |    + sum(CASE WHEN d > $hi THEN 1 ELSE 0 END)) * 1000
       |    // count(*))::BIGINT AS clip_frac_milli
       |FROM (
       |  SELECT $policy AS policy,
       |    ${graft.ops.PortableHash.truncToZero(s"$lpNew")} - ${graft.ops.PortableHash.truncToZero(s"$lpOld")} AS d
       |  FROM $table)
       |GROUP BY policy""".stripMargin
  }
}
