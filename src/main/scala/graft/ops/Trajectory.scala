package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RL trajectory analytics (round 18) — the rollout side of a
  * post-training pipeline: rows are agent/environment steps
  * `(traj_id, step, reward, …)` and the training loop needs
  * discounted returns, per-policy episode statistics, and per-step
  * advantages before any policy-gradient update consumes the data.
  *
  * Everything stays EXACT in integer milli, the judge/preference
  * convention: rewards are integer milli-reward, the discount is
  * `gammaMilli / 1000`, and the return recurrence is
  * `G_n = r_n`, `G_i = r_i + trunc(γ·G_{i+1} / 1000)` — TRUNCATING
  * division, because rewards (and therefore returns) may be negative
  * and on signed integers BOTH engines truncate toward zero: Spark
  * `div` by definition and DuckDB `//` as well (probed
  * `-7 // 2 = -3`, not a floored -4 — the adversarial sweep caught
  * an earlier floorDiv draft of the kernel diverging from the oracle
  * on all-negative episodes, the class the oracle fixture's
  * mostly-positive rewards never reaches; the "`//` floors" claim in
  * some older docstrings is wrong, benign there only because those
  * ops never divide signed values). The recurrence is the DEFINITION
  * — each step's rounding feeds the next — so the oracle replays it
  * with a per-trajectory recursive CTE rather than a closed form.
  *
  * Domain: `step` only needs to ORDER the episode — both sides
  * re-rank it dense (Spark via the sorted collect's positions, the
  * twin via row_number over the same `(step, reward)` order), so a
  * sparse or duplicated step column renumbers IDENTICALLY on both
  * engines (round-18 ADVICE: the old twin recursed on `step - 1` and
  * silently dropped rows above a gap while Spark renumbered).
  * Rewards/values are INTEGER milli (NULL coalesces to 0 on both
  * engines, pinned in TrajectorySpec; a DOUBLE column goes through
  * trunc() in the twins so both dialects truncate toward zero), and
  * `policy` is constant within a trajectory (collapsed with min(),
  * the agreement re-annotation convention).
  *
  * Plan shapes: [[trajReturns]] is ONE trajectory-keyed exchange;
  * per-trajectory state is bounded by episode length (the per-item
  * panel convention — episodes are 10²-10³ steps by construction)
  * and the return pass is the compiled `graft_disc_returns` kernel,
  * linear per episode. [[trajStats]] is two partial-agged exchanges
  * (trajectory grain, then |policies| rows). [[trajAdvantage]]
  * re-executes the returns lineage for its baseline branch — at
  * corpus scale a second columnar scan is cheaper than caching the
  * step-grain frame (the chatPackMasked two-branch argument) — and
  * the baseline it joins back is (policy × step) grain,
  * metadata-sized, broadcast-eligible under AQE.
  *
  * The two-branch re-scan DOUBLES whatever lineage feeds it — priced
  * deliberately (ProbeRound19 `advsess`, 20M raw events through the
  * `traj_from_sessions` sessionization): returns-over-sessions 5.1s
  * warm, advantage-over-sessions 10.9s — the expected 2×, still
  * linear and windowed per user. The 2× stands as the design: leasing
  * the step frame would pin a CORPUS-sized intermediate
  * (`Caches.lease` is metadata-only by repo convention, and at 100 TB
  * the doubled columnar window pass beats spilling a cached 100 TB
  * frame). If an upstream composition ever becomes super-linear, cut
  * the composition at a landed parquet table instead of leasing.
  *
  * Streaming stance: the [[episodeAgg]] level maintains itself in
  * complete mode (one distributive agg); [[statsOfEpisodes]] rolls it
  * up to |policies| rows at read time, because Spark cannot chain two
  * streaming aggregations. [[trajReturns]]/[[trajAdvantage]] are
  * batch-only by design (the return of an episode is undefined until
  * the episode closes; run them over landed episodes).
  */
object Trajectory {

  private def returnsCore(df: DataFrame, traj: String, step: String,
                          reward: String, policy: Option[String],
                          gammaMilli: Int, maxSteps: Int): DataFrame = {
    val polAgg = policy.map(p => expr(s"min($p)").as("policy")).toSeq
    graft.functions.VectorFunctions.attach(df)
      .groupBy(col(traj).as("traj_id"))
      .agg(expr(
        s"transform(sort_array(collect_list(struct(" +
          s"cast($step AS BIGINT) AS s, " +
          s"coalesce(cast($reward AS BIGINT), cast(0 AS BIGINT)) AS r))), " +
          "x -> x.r)").as("__rs"), polAgg: _*)
      // episode length is bounded by CONVENTION, not construction — a
      // runaway never-terminating rollout would make its group state
      // arbitrarily large. maxSteps is the agreement/winnowPairs guard:
      // oversized episodes drop whole (a truncated return would be
      // silently wrong — G_1 depends on every later step), and a
      // dropped episode is a curation signal, not training data.
      .where(size(col("__rs")) <= maxSteps)
      .select(col("traj_id") +: policy.map(_ => col("policy")).toSeq :+
        posexplode(expr(
          s"graft_disc_returns(__rs, cast($gammaMilli AS BIGINT))")): _*)
      .select(col("traj_id") +: policy.map(_ => col("policy")).toSeq :+
        (col("pos") + 1).cast("long").as("step") :+
        col("col").as("return_milli"): _*)
  }

  /** Discounted return-to-go per (trajectory, step), integer milli. */
  def trajReturns(df: DataFrame, traj: String, step: String,
                  reward: String, gammaMilli: Int = 900,
                  maxSteps: Int = 100000): DataFrame =
    returnsCore(df, traj, step, reward, None, gammaMilli, maxSteps)

  /** Recursive-CTE fragment shared by the returns/advantage twins:
    * CTEs `t` (projected steps), `mx` (episode tails) and `rec` (the
    * backward recurrence, one recursion level per step).
    *
    * `step` is RE-RANKED dense with row_number ordered by
    * `(raw step, r)` — exactly the order the Spark side's
    * `sort_array(collect_list(struct(s, r)))` imposes — so a sparse or
    * duplicated step column means the SAME dense renumbering on both
    * engines instead of the round-18 divergence (Spark silently
    * renumbered via posexplode while the twin's recursion died at the
    * first gap; ties beyond `(step, r)` are immaterial because equal
    * rewards in either order yield the same recurrence). The step key
    * is TRUNCATED through truncToZero on the twin side because the
    * Spark struct sorts by `cast(step AS BIGINT)` — a fractional
    * DOUBLE step (in-domain: step only needs to ORDER the episode)
    * would otherwise tie on Spark (broken by r) while DuckDB ordered
    * by the raw fractional value, silently diverging the dense
    * renumbering (round-19 ADVICE class). `NULLS
    * FIRST` because that is where Spark's struct sort puts a NULL
    * sort field (probed via sort_array this round) while DuckDB's
    * ORDER BY defaults NULLS LAST — a NULL step is still a smell, but
    * it now renumbers identically instead of diverging. The reward
    * cast goes through trunc() so a DOUBLE reward column truncates
    * toward zero like Spark's cast-to-long, instead of DuckDB's
    * round-half-even `::BIGINT` (the round-18 ADVICE class; integral
    * milli inputs — the documented domain — are unaffected).
    */
  private def recCtes(table: String, traj: String, step: String,
                      reward: String, gammaMilli: Int,
                      maxSteps: Int): String =
    s"""t0 AS (
       |  SELECT traj_id, r,
       |    row_number() OVER (PARTITION BY traj_id
       |      ORDER BY ${graft.ops.PortableHash.truncToZero("step0")} NULLS FIRST, r) AS step
       |  FROM (SELECT $traj AS traj_id, $step AS step0,
       |          ${graft.ops.PortableHash.truncToZero(s"coalesce($reward, 0)")} AS r
       |        FROM $table)),
       |ok AS (SELECT traj_id FROM t0 GROUP BY traj_id
       |       HAVING count(*) <= $maxSteps),
       |t AS (SELECT t0.* FROM t0 JOIN ok USING (traj_id)),
       |mx AS (SELECT traj_id, max(step) AS mx FROM t GROUP BY traj_id),
       |rec AS (
       |  SELECT t.traj_id, t.step, t.r AS g
       |  FROM t JOIN mx ON t.traj_id = mx.traj_id AND t.step = mx.mx
       |  UNION ALL
       |  SELECT t.traj_id, t.step,
       |    (t.r + ($gammaMilli * rec.g // 1000))::BIGINT AS g
       |  FROM rec JOIN t ON t.traj_id = rec.traj_id AND t.step = rec.step - 1)""".stripMargin

  /** DuckDB twin of [[trajReturns]]. */
  def trajReturnsSql(table: String, traj: String, step: String,
                     reward: String, gammaMilli: Int = 900,
                     maxSteps: Int = 100000): String =
    s"""WITH RECURSIVE ${recCtes(table, traj, step, reward, gammaMilli, maxSteps)}
       |SELECT traj_id, step::BIGINT AS step, g::BIGINT AS return_milli
       |FROM rec""".stripMargin

  /** Episode-grain rollup — one row per (trajectory, policy) with step
    * count and signed reward sum. This is the level Structured
    * Streaming MAINTAINS (a single distributive agg, complete-mode
    * safe); the |policies| report below is a read-time batch agg over
    * it, because Spark cannot chain two streaming aggregations (the
    * btScores-over-the-maintained-pair-table convention, pinned in
    * StreamingOpsSpec).
    */
  def episodeAgg(df: DataFrame, traj: String, policy: String,
                 reward: String): DataFrame =
    df.groupBy(col(traj).as("__t"), col(policy).as("policy"))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col(reward).cast("long"), lit(0L))).as("__r"))

  /** Per-policy episode statistics: trajectory count, total steps,
    * mean episode length in milli (non-negative integer division),
    * and total reward kept as a SUM (signed — the no-signed-division
    * convention).
    */
  def trajStats(df: DataFrame, traj: String, policy: String,
                reward: String): DataFrame =
    statsOfEpisodes(episodeAgg(df, traj, policy, reward))

  /** The |policies|-row report over an [[episodeAgg]] frame. */
  def statsOfEpisodes(ep: DataFrame): DataFrame =
    ep.groupBy(col("policy"))
      .agg(count(lit(1)).as("n_traj"), sum(col("__n")).as("n_steps"),
        sum(col("__r")).as("total_reward_milli"))
      .select(col("policy"), col("n_traj"), col("n_steps"),
        expr("cast(n_steps * 1000 div n_traj AS BIGINT)").as("mean_len_milli"),
        col("total_reward_milli"))

  /** DuckDB twin of [[trajStats]]. */
  def trajStatsSql(table: String, traj: String, policy: String,
                   reward: String): String =
    s"""SELECT policy, count(*) AS n_traj,
       |  sum(n)::BIGINT AS n_steps,
       |  (sum(n) * 1000 // count(*))::BIGINT AS mean_len_milli,
       |  sum(r)::BIGINT AS total_reward_milli
       |FROM (
       |  SELECT $traj AS t, $policy AS policy, count(*) AS n,
       |    sum(${graft.ops.PortableHash.truncToZero(s"coalesce($reward, 0)")})::BIGINT AS r
       |  FROM $table GROUP BY 1, 2)
       |GROUP BY policy""".stripMargin

  /** Per-step ADVANTAGE against the per-(policy, step) peer baseline:
    * `adv_scaled_milli = G·n_peers − Σ_peers G` — kept as the exact
    * scaled integer (returns are signed; dividing by n_peers would hit
    * a signed division (banned from hashed columns), and the consumer
    * normalizes in float
    * land anyway). A single-trajectory stratum reports 0 by
    * construction (G·1 − G).
    */
  def trajAdvantage(df: DataFrame, traj: String, step: String,
                    reward: String, policy: String,
                    gammaMilli: Int = 900,
                    maxSteps: Int = 100000): DataFrame = {
    val rets = returnsCore(df, traj, step, reward, Some(policy), gammaMilli,
      maxSteps)
    val base = rets.groupBy(col("policy"), col("step"))
      .agg(count(lit(1)).as("n_peers"),
        sum(col("return_milli")).as("baseline_sum_milli"))
    rets.join(base, Seq("policy", "step"))
      .select(col("traj_id"), col("policy"), col("step"),
        col("return_milli"), col("n_peers"),
        (col("return_milli") * col("n_peers") - col("baseline_sum_milli"))
          .as("adv_scaled_milli"))
  }

  /** GAE(λ) advantages per (trajectory, step) — the estimator PPO
    * actually consumes (Schulman et al.'s generalized advantage
    * estimation, re-listed from the public description): TD residual
    * `δ_i = r_i + trunc(γ·V_{i+1} / 1000) − V_i` (V beyond the episode
    * tail is 0) and the backward recurrence `A_n = δ_n`,
    * `A_i = δ_i + trunc(γλ·A_{i+1} / 10⁶)` — the same
    * backward-recurrence shape as [[trajReturns]] with per-step value
    * predictions and a second `lambdaMilli` parameter, all in exact
    * integer milli with TRUNCATING division (δ and A are SIGNED — a
    * critic overestimates as often as it underestimates — and both
    * engines truncate signed integers toward zero; the all-negative
    * class the sweep caught on the returns kernel is live here too,
    * TrajectorySpec pins it). λ = 1000 degrades to discounted
    * Monte-Carlo-minus-value, λ = 0 to the one-step TD residual (both
    * spec-pinned).
    *
    * Plan shape: identical to [[trajReturns]] — ONE trajectory-keyed
    * exchange, episode-bounded state behind the same `maxSteps`
    * whole-episode drop (a truncated GAE tail is silently wrong for
    * every earlier step), and the backward pass is the compiled
    * `graft_gae_adv` kernel fed the raw sorted struct array (the
    * kernel-over-HOF rule: two `transform` projections under the
    * kernel would break whole-stage codegen and double the collect
    * buffer).
    */
  def trajGae(df: DataFrame, traj: String, step: String,
              reward: String, value: String, gammaMilli: Int = 900,
              lambdaMilli: Int = 950, maxSteps: Int = 100000): DataFrame =
    graft.functions.VectorFunctions.attach(df)
      .groupBy(col(traj).as("traj_id"))
      .agg(expr(
        s"sort_array(collect_list(struct(" +
          s"cast($step AS BIGINT) AS s, " +
          s"coalesce(cast($reward AS BIGINT), cast(0 AS BIGINT)) AS r, " +
          s"coalesce(cast($value AS BIGINT), cast(0 AS BIGINT)) AS v)))")
        .as("__xs"))
      .where(size(col("__xs")) <= maxSteps)
      .select(col("traj_id"), posexplode(expr(
        s"graft_gae_adv(__xs, $gammaMilli, $lambdaMilli)")))
      .select(col("traj_id"),
        (col("pos") + 1).cast("long").as("step"),
        col("col").as("adv_milli"))

  /** DuckDB twin of [[trajGae]] — the [[recCtes]] shape with the value
    * column carried through the recursion (each level needs V_{i+1}
    * and A_{i+1}); steps re-rank dense over `(trunc(step), r, v)`, the
    * exact order of the Spark side's sorted struct collect (the step
    * key truncates through truncToZero to mirror Spark's
    * cast-to-BIGINT struct field — the round-19 ADVICE class).
    */
  def trajGaeSql(table: String, traj: String, step: String,
                 reward: String, value: String, gammaMilli: Int = 900,
                 lambdaMilli: Int = 950, maxSteps: Int = 100000): String =
    s"""WITH RECURSIVE t0 AS (
       |  SELECT traj_id, r, v,
       |    row_number() OVER (PARTITION BY traj_id
       |      ORDER BY ${graft.ops.PortableHash.truncToZero("step0")} NULLS FIRST, r, v) AS step
       |  FROM (SELECT $traj AS traj_id, $step AS step0,
       |          ${graft.ops.PortableHash.truncToZero(s"coalesce($reward, 0)")} AS r,
       |          ${graft.ops.PortableHash.truncToZero(s"coalesce($value, 0)")} AS v
       |        FROM $table)),
       |ok AS (SELECT traj_id FROM t0 GROUP BY traj_id
       |       HAVING count(*) <= $maxSteps),
       |t AS (SELECT t0.* FROM t0 JOIN ok USING (traj_id)),
       |mx AS (SELECT traj_id, max(step) AS mx FROM t GROUP BY traj_id),
       |rec AS (
       |  SELECT t.traj_id, t.step, t.v, (t.r - t.v)::BIGINT AS a
       |  FROM t JOIN mx ON t.traj_id = mx.traj_id AND t.step = mx.mx
       |  UNION ALL
       |  SELECT t.traj_id, t.step, t.v,
       |    (t.r + ($gammaMilli * rec.v // 1000) - t.v
       |      + ($gammaMilli * $lambdaMilli * rec.a // 1000000))::BIGINT AS a
       |  FROM rec JOIN t ON t.traj_id = rec.traj_id AND t.step = rec.step - 1)
       |SELECT traj_id, step::BIGINT AS step, a::BIGINT AS adv_milli
       |FROM rec""".stripMargin

  /** DuckDB twin of [[trajAdvantage]]. */
  def trajAdvantageSql(table: String, traj: String, step: String,
                       reward: String, policy: String,
                       gammaMilli: Int = 900,
                       maxSteps: Int = 100000): String =
    s"""WITH RECURSIVE ${recCtes(table, traj, step, reward, gammaMilli, maxSteps)},
       |p AS (SELECT $traj AS traj_id, min($policy) AS policy
       |      FROM $table GROUP BY 1),
       |r2 AS (
       |  SELECT rec.traj_id, p.policy, rec.step::BIGINT AS step,
       |    rec.g::BIGINT AS return_milli
       |  FROM rec JOIN p USING (traj_id)),
       |b AS (
       |  SELECT policy, step, count(*) AS n_peers,
       |    sum(return_milli)::BIGINT AS baseline_sum_milli
       |  FROM r2 GROUP BY 1, 2)
       |SELECT r2.traj_id, r2.policy, r2.step, r2.return_milli, b.n_peers,
       |  (r2.return_milli * b.n_peers - b.baseline_sum_milli)::BIGINT
       |    AS adv_scaled_milli
       |FROM r2 JOIN b USING (policy, step)""".stripMargin
}
