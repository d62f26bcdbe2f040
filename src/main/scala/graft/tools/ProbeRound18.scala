package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 scale probe: the trajectory family at realistic rollout
  * shapes and the BPE-lens chat ops at production conversation sizes.
  * The oracle fixture maxes out at ~70 steps per user; production RL
  * rollout tables carry 10⁴-10⁵ episodes of 10²-10³ steps. The
  * returns pass is one trajectory-keyed exchange + the compiled
  * backward-recurrence kernel — this prices it at 20M steps reshaped
  * into 20k episodes × 1000 dense steps (arithmetically derived, so
  * the fixture costs a scan, not a window shuffle), and prices the
  * advantage composition's two-branch re-scan + metadata join on the
  * same table.
  *
  * Usage: runMain graft.tools.ProbeRound18 [probeDir] [what,csv]
  * with what from {baseline,traj,truncbpe,fertility,evalrm,judge2,policyopt,canary,degen}.
  */
object ProbeRound18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      // collect the PREVIOUS leg's garbage before starting the clock —
      // the Bench discipline: a 20M-row join leaves GB-scale young-gen
      // debris whose collection otherwise lands inside whichever leg
      // runs next (observed 5-8x inflation on the interleaved reads)
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

    // 20k episodes x 1000 dense steps from the 20M-event table —
    // trajectory/step derived ARITHMETICALLY from the dense event_id
    // range so the fixture is a pure scan (a row_number fixture would
    // price a window shuffle into every leg)
    val steps = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("traj", expr("event_id % 20000"))
      .withColumn("step", expr("event_id div 20000 + 1"))
      .withColumn("reward_milli", expr(
        "cast(cast(value AS DECIMAL(18,2)) * 1000 AS BIGINT) - 1500"))
      .withColumn("policy", expr("concat('p', traj % 7)"))
      .select("traj", "step", "reward_milli", "policy")

    // 50-turn/8k-char conversations (the ProbeRound17 fixture, same
    // let-bound build) for the BPE-lens truncation leg
    lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("conv", expr(graft.ops.PortableHash.let1("__t",
        "regexp_replace(lower(concat(text, ' ', text, ' ', text)), '[^a-z0-9 ]', '')",
        "concat('[{\"role\":\"system\",\"content\":\"be concise\"},', " +
          "concat_ws(',', transform(sequence(1, 49), i -> " +
          "concat('{\"role\":\"', IF(i % 2 = 1, 'user', 'assistant'), " +
          "'\",\"content\":\"', " +
          "substring(__t, cast((i * 37 + doc_id % 101) % 400 + 1 AS INT), 150), " +
          "'\"}'))), ']')")))
      .select(col("doc_id"), col("conv"))

    for (rep <- 1 to 2) {
      println(s"[probe] --- rep $rep ---")
      if (on("baseline")) time("baseline: step-fixture scan (sum reward)")(
        run(steps.groupBy().agg(sum(col("reward_milli")))))
      if (on("traj")) {
        time("traj_returns x 20M steps (20k episodes x 1000)")(
          run(graft.ops.Trajectory.trajReturns(
            steps, "traj", "step", "reward_milli")))
        time("traj_advantage x 20M steps (7 policies)")(
          run(graft.ops.Trajectory.trajAdvantage(
            steps, "traj", "step", "reward_milli", "policy")))
        time("traj_stats x 20M steps")(
          run(graft.ops.Trajectory.trajStats(
            steps, "traj", "policy", "reward_milli")))
      }
      if (on("truncbpe")) {
        time("chat_truncate (word lens) budget=2000 x 1M")(
          run(graft.ops.Chat.chatTruncate(docs, "doc_id", "conv",
            budget = 2000)))
        time("chat_truncate_bpe budget=2000 x 1M")(
          run(graft.ops.Chat.chatTruncate(docs, "doc_id", "conv",
            budget = 2000, cost = graft.ops.Bpe.sparkTokenCountExpr)))
      }
      if (on("fertility")) time("bpe_fertility_report x 1M docs")(
        run(graft.ops.Bpe.bpeFertility(
          spark.read.parquet(s"$dir/documents.parquet"), "text", "lang")))
      if (on("evalrm")) {
        val samples = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("prompt_id", expr("event_id % 1000000"))
          .withColumn("passed", expr("(event_id % 5) < 2"))
        time("eval_pass_at_k (k=1,5,10) x 20M samples / 1M prompts")(
          run(graft.ops.PassAtK.passAtK(
            samples, "prompt_id", "passed", ks = Seq(1, 5, 10))))
        val scored = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("score_chosen", expr(
            "cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .withColumn("score_rejected", expr(
            "score_chosen - (event_id % 9 - 2) * 300"))
        time("pref_rm_calibration x 20M pairs")(
          run(graft.ops.Preference.rmCalibration(
            scored, "score_chosen", "score_rejected")))
      }
      if (on("judge2")) {
        val matches = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("model_a", expr("concat('m', user_id % 10)"))
          .withColumn("model_b", expr("concat('m', event_id % 10)"))
          .withColumn("winner", expr(
            "IF(event_id % 11 = 0, NULL, " +
              "IF(event_id % 3 = 0, model_b, model_a))"))
          .withColumn("len_a", expr("cast(100 + event_id % 3000 AS BIGINT)"))
          .withColumn("len_b", expr("cast(100 + (event_id * 7) % 3000 AS BIGINT)"))
        time("judge_position_bias x 20M matches")(
          run(graft.ops.Judge.positionBias(
            matches, "model_a", "model_b", "winner")))
        time("judge_length_bias x 20M matches")(
          run(graft.ops.Judge.lengthBias(
            matches, "model_a", "model_b", "winner", "len_a", "len_b")))
      }
      if (on("policyopt")) {
        val samples = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("prompt_id", expr("event_id % 1000000"))
          .withColumn("reward_milli", expr(
            "cast(cast(value AS DECIMAL(18,2)) * 1000 AS BIGINT) - 1500"))
          .withColumn("policy", expr("concat('p', user_id % 3)"))
          .withColumn("lp_new", expr("cast(-(event_id % 700) AS BIGINT)"))
          .withColumn("lp_old", expr("cast(-(event_id * 3 % 700) AS BIGINT)"))
        time("grpo_advantage x 20M samples / 1M prompts")(
          run(graft.ops.PolicyOpt.grpoAdvantage(
            samples, "prompt_id", "event_id", "reward_milli")))
        time("ppo_clip_report x 20M samples")(
          run(graft.ops.PolicyOpt.ppoClipStats(
            samples, "policy", "lp_new", "lp_old")))
      }
      if (on("canary")) time("canary_scan (8 canaries) x 1M docs")(
        run(graft.ops.Canary.canaryScan(
          spark.read.parquet(s"$dir/documents.parquet"), "text",
          (1 to 8).map(i => s"CANARY-$i-never-present"))))
      if (on("degen")) time("chat_degeneration (24 asst turns/conv) x 1M")(
        run(graft.ops.TextAnalysis.repetitionSignalsLocal(
          graft.ops.Chat.assistantTurns(docs, "doc_id", "conv")
            .withColumn("turn_key", expr("doc_id * 100 + turn_idx")),
          "turn_key", "content")))
    }
    spark.stop()
  }
}
