package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 scale probe — the two open pricing questions from the
  * round-18 verdict plus the new families at 20M rows:
  *
  *  1. `gae`: GAE(λ) at 20k episodes × 1000 dense steps — same
  *     arithmetic step fixture as ProbeRound18's returns leg so the
  *     numbers compare directly (the GAE kernel does strictly more
  *     work per step: a TD residual against the value column plus the
  *     γλ recurrence).
  *  2. `advsess`: the COMPOSED advantage-over-sessions cost — the
  *     verdict's open question: [[graft.ops.Trajectory.trajAdvantage]]
  *     re-executes its returns lineage for the baseline branch, which
  *     doubles the upstream SESSIONIZATION WINDOW when composed over
  *     `traj_from_sessions`-shaped input. This leg prices (a) returns
  *     over sessionized episodes, (b) advantage over the same (the
  *     2× branch), at 20M raw events — the measured gap IS the
  *     double-window cost to document (or lease away if it blows up).
  *  3. `kappa`/`btconv`/`dpo`: the round-19 judge/preference additions
  *     at 20M labels/matches/pairs.
  *
  * Usage: runMain graft.tools.ProbeRound19 [probeDir] [what,csv]
  * with what from {gae,advsess,kappa,btconv,dpo}.
  */
object ProbeRound19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      // gc before the clock — the Bench discipline (see ProbeRound18)
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-56s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)

    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // the ProbeRound18 step fixture + a signed arithmetic value column
    val steps = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("traj", expr("event_id % 20000"))
      .withColumn("step", expr("event_id div 20000 + 1"))
      .withColumn("reward_milli", expr(
        "cast(cast(value AS DECIMAL(18,2)) * 1000 AS BIGINT) - 1500"))
      .withColumn("value_milli", expr(
        "cast(((traj * 7 + step * 13) % 41) * 100 - 2000 AS BIGINT)"))
      .withColumn("policy", expr("concat('p', traj % 7)"))
      .select("traj", "step", "reward_milli", "value_milli", "policy")

    // sessionized episodes from raw events — the traj_from_sessions
    // ingest shape (per-user lag window + running sum + row_number)
    def sessionized = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      spark.read.parquet(s"$dir/events.parquet")
        // raw probe parquet reads ts as TIMESTAMP_NTZ (the Queries.t
        // normalization is part of the query fixture, not this probe)
        .withColumn("ts", expr("cast(ts AS TIMESTAMP)"))
        .withColumn("__prev_us", lag(expr("unix_micros(ts)"), 1).over(byUser))
        .withColumn("__new", when(col("__prev_us").isNull ||
          expr("unix_micros(ts)") - col("__prev_us") > 30L * 60 * 1000000,
          1L).otherwise(0L))
        .withColumn("session_no", sum(col("__new")).over(running))
        .withColumn("traj_id", expr("concat('u', user_id, 's', session_no)"))
        .withColumn("step", expr(
          "row_number() OVER (PARTITION BY user_id, session_no " +
            "ORDER BY ts, event_id)"))
        .withColumn("reward_milli", expr(
          "cast(cast(value AS DECIMAL(18,2)) * 1000 AS BIGINT) - 1500"))
        .withColumn("policy", expr("concat('p', user_id % 3)"))
    }

    for (rep <- 1 to 2) {
      println(s"[probe] --- rep $rep ---")
      if (on("gae")) {
        time("traj_returns x 20M steps (comparison floor)")(
          run(graft.ops.Trajectory.trajReturns(
            steps, "traj", "step", "reward_milli")))
        time("traj_gae x 20M steps (20k episodes x 1000)")(
          run(graft.ops.Trajectory.trajGae(
            steps, "traj", "step", "reward_milli", "value_milli")))
      }
      if (on("advsess")) {
        time("returns over SESSIONIZED 20M events (1 window pass)")(
          run(graft.ops.Trajectory.trajReturns(
            sessionized, "traj_id", "step", "reward_milli")))
        time("advantage over SESSIONIZED 20M events (2x branch)")(
          run(graft.ops.Trajectory.trajAdvantage(
            sessionized, "traj_id", "step", "reward_milli", "policy")))
      }
      if (on("kappa")) {
        // 20M labels: 2M items x 10 judges, 5 verdict categories
        val labels = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("item", expr("event_id % 2000000"))
          .withColumn("judge", expr("concat('j', event_id div 2000000)"))
          .withColumn("verdict", expr(
            "concat('v', (event_id + user_id) % 5)"))
        time("judge_agreement x 20M labels (floor)")(
          run(graft.ops.Judge.agreement(labels, "item", "judge", "verdict")))
        time("judge_kappa x 20M labels (2M items x 10 judges)")(
          run(graft.ops.Judge.kappa(labels, "item", "judge", "verdict")))
        time("judge_fleiss_kappa x 20M labels")(
          run(graft.ops.Judge.fleissKappa(labels, "item", "judge", "verdict")))
        time("judge_self_consistency x 20M labels")(
          run(graft.ops.Judge.selfConsistency(
            labels.withColumn("item", expr("item % 1500000")),
            "item", "judge", "verdict")))
      }
      if (on("policyopt2")) {
        val samples = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("prompt_id", expr("event_id % 1000000"))
          .withColumn("reward_milli", expr(
            "cast(cast(value AS DECIMAL(18,2)) * 1000 AS BIGINT) - 1500"))
          .withColumn("policy", expr("concat('p', user_id % 3)"))
          .withColumn("lp_new", expr("cast(-(event_id % 700) AS BIGINT)"))
          .withColumn("lp_old", expr("cast(-(event_id * 3 % 700) AS BIGINT)"))
        time("grpo_group_stats x 20M samples / 1M prompts")(
          run(graft.ops.PolicyOpt.grpoGroupStats(
            samples, "prompt_id", "reward_milli")))
        time("ppo_kl_report x 20M samples")(
          run(graft.ops.PolicyOpt.klReport(
            samples, "policy", "lp_new", "lp_old")))
        val passes = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("prompt_id", expr("event_id % 1000000"))
          .withColumn("passed", expr("(event_id % 5) < 2"))
        time("eval_pass_all_k (k=1,5,10) x 20M samples / 1M prompts")(
          run(graft.ops.PassAtK.passAllK(
            passes, "prompt_id", "passed", ks = Seq(1, 5, 10))))
        time("pref_bon_select x 20M samples / 1M prompts")(
          run(graft.ops.Sampling.bonSelect(
            samples.withColumn("score_milli",
              expr("cast((event_id % 13) * 100 AS BIGINT) - 600")),
            "prompt_id", "event_id", "score_milli")))
      }
      if (on("refusal")) {
        // 1M 4-turn conversations with refusal stems planted by residue
        val convs = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("conv", expr(
            "concat('[', concat_ws(',', transform(sequence(0, 3), i -> " +
              "concat('{\"role\":\"', IF(i % 2 = 0, 'user', 'assistant'), " +
              "'\",\"content\":\"', " +
              "CASE WHEN i = 1 AND doc_id % 5 = 0 THEN 'I cannot help with that request.' " +
              "ELSE array_join(slice(filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '), " +
              "x -> x != ''), cast(i * 6 + 1 AS INT), 6), ' ') END, '\"}'))), ']')"))
          .select("doc_id", "conv")
        time("refusal fixture baseline: sum(length(conv))")(
          run(convs.groupBy().agg(sum(length(col("conv"))))))
        time("chat_refusal_report x 1M 4-turn convs")(
          run(graft.ops.Chat.refusalReport(convs, "doc_id", "conv")))
      }
      if (on("btconv")) {
        val matches = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("model_a", expr("concat('m', user_id % 10)"))
          .withColumn("model_b", expr("concat('m', event_id % 10)"))
          .withColumn("winner", expr(
            "IF(event_id % 11 = 0, NULL, " +
              "IF(event_id % 3 = 0, model_b, model_a))"))
        time("judge_bt x 20M matches (floor)")(
          run(graft.ops.Judge.btScores(
            matches, "model_a", "model_b", "winner")))
        time("judge_bt_convergence x 20M matches")(
          run(graft.ops.Judge.btConvergence(
            matches, "model_a", "model_b", "winner")))
      }
      if (on("dpo")) {
        val pairs = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("lpc_new", expr("cast(-(event_id % 89) * 17 AS BIGINT)"))
          .withColumn("lpc_ref", expr("cast(-(event_id % 97) * 13 AS BIGINT)"))
          .withColumn("lpr_new", expr("cast(-(event_id % 83) * 19 AS BIGINT)"))
          .withColumn("lpr_ref", expr("cast(-(event_id % 79) * 11 AS BIGINT)"))
        time("pref_dpo_margins (report) x 20M pairs")(
          run(graft.ops.Preference.dpoMarginReport(pairs, "event_id",
            "lpc_new", "lpc_ref", "lpr_new", "lpr_ref")))
      }
    }
    spark.stop()
  }
}
