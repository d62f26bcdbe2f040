package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 scale probe: the chat family at REALISTIC conversation
  * shapes. The oracle fixture maxes out at 4 body turns and ~70
  * rendered tokens; production SFT corpora carry 10-50 turn
  * conversations at 4-10k chars. The struct-accumulator passes
  * (spans, cumulative token ends) are O(turns) per row and the span
  * explode is O(assistant turns) — this probe prices them at 1M
  * conversations x 50 turns x ~8k chars (~8 GB of JSON built on the
  * fly), against a fixture-build + scan baseline so the per-op cost
  * is separable (the cached-blob timing trap: persisting the fixture
  * would time cache deserialization instead, so the fixture is FUSED
  * into every probe and the baseline subtracted).
  *
  * Usage: runMain graft.tools.ProbeRound17 [probeDir] [what,csv]
  * (SPARK_DRIVER_MEM=48g recommended; each rep scans ~8 GB of
  * generated JSON.)
  */
object ProbeRound17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-56s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)

    // 50-turn conversation per doc (~8k chars): system head + 49 body
    // turns alternating user/assistant (odd count -> ends on assistant),
    // content = ~150-char slices at a doc-varying stride over the
    // tripled normalized text (JSON-safe: [a-z0-9 ] only). The
    // normalized text is LET-BOUND (PortableHash.let1): as a plain
    // withColumn it is referenced 49x inside the transform lambda and
    // the regexp_replace re-evaluates per reference — the fixture alone
    // ran 50x the render cost (caught live in round 17)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("conv", expr(graft.ops.PortableHash.let1("__t",
        "regexp_replace(lower(concat(text, ' ', text, ' ', text)), '[^a-z0-9 ]', '')",
        "concat('[{\"role\":\"system\",\"content\":\"be concise\"},', " +
          "concat_ws(',', transform(sequence(1, 49), i -> " +
          "concat('{\"role\":\"', IF(i % 2 = 1, 'user', 'assistant'), " +
          "'\",\"content\":\"', " +
          "substring(__t, cast((i * 37 + doc_id % 101) % 400 + 1 AS INT), 150), " +
          "'\"}'))), ']')")))
      .select(col("doc_id"), col("conv"))

    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // two reps each (JIT warmup: read the SECOND line of a pair)
    for (rep <- 1 to 2) {
      println(s"[probe] --- rep $rep ---")
      if (on("baseline")) time("baseline: fixture build + scan (sum length)")(
        run(docs.groupBy().agg(sum(length(col("conv"))))))
      if (on("stats")) time("chat_turn_stats @ 50 turns/8k chars x 1M")(
        run(graft.ops.Chat.chatTurnStats(docs, "doc_id", "conv")))
      if (on("render")) time("chat_render @ 50 turns/8k chars x 1M")(
        run(graft.ops.Chat.chatRender(docs, "doc_id", "conv")))
      if (on("spans")) time("chat_mask_spans (24 spans/doc) x 1M")(
        run(graft.ops.Chat.chatAssistantSpans(docs, "doc_id", "conv")))
      if (on("tokens")) time("chat_mask_tokens (24 spans/doc) x 1M")(
        run(graft.ops.Chat.chatMaskTokens(docs, "doc_id", "conv")))
      if (on("quarantine")) time("chat_quarantine x 1M")(
        run(graft.ops.Chat.chatQuarantine(docs, "doc_id", "conv")))
      if (on("truncate")) time("chat_truncate budget=2000 x 1M")(
        run(graft.ops.Chat.chatTruncate(docs, "doc_id", "conv", budget = 2000)))
      // preference triples at corpus scale: prompt/chosen/rejected as
      // word slices of the raw text (the oracle fixture's shape) —
      // prices the row-local stats pass and the digest-keyed dedup
      if (on("pref")) {
        val pairs = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("__ws", expr(
            "filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '), x -> x != '')"))
          .withColumn("prompt", expr("array_join(slice(__ws, 1, 8), ' ')"))
          .withColumn("chosen", expr("array_join(slice(__ws, 9, 12), ' ')"))
          .withColumn("rejected", expr("array_join(slice(__ws, 9, 6), ' ')"))
          .select("doc_id", "prompt", "chosen", "rejected")
        time("pref_pair_stats x 1M")(
          run(graft.ops.Preference.pairStats(
            pairs, "doc_id", "prompt", "chosen", "rejected")))
        time("pref_pair_dedup x 1M")(
          run(graft.ops.Preference.pairDedup(
            pairs, "doc_id", "prompt", "chosen", "rejected")))
      }
      // pairwise judgments at corpus scale: 20M matches over 10 models
      // derived from the events table — prices the one pair-keyed
      // exchange (winRate) and the scan-once + pair-grain iteration
      // claim (btScores)
      if (on("judge")) {
        val matches = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("model_a", expr("concat('m', user_id % 10)"))
          .withColumn("model_b", expr("concat('m', event_id % 10)"))
          .withColumn("winner", expr(
            "IF(event_id % 11 = 0, NULL, " +
              "IF(event_id % 3 = 0, model_b, model_a))"))
          .select("event_id", "model_a", "model_b", "winner")
        time("judge_winrate x 20M matches")(
          run(graft.ops.Judge.winRate(
            matches, "model_a", "model_b", "winner")))
        time("judge_bt (3 iters) x 20M matches")(
          run(graft.ops.Judge.btScores(
            matches, "model_a", "model_b", "winner")))
        // agreement is the one judge op whose exchange carries LABEL
        // rows (item-keyed self-join): 3 judges per event = 60M label
        // rows, ~9 pair rows per item out of the join
        val labels = spark.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"), explode(expr("sequence(0, 2)")).as("j"))
          .select(col("event_id"), expr("concat('j', j)").as("judge"),
            expr("IF((event_id + j * (event_id % 4)) % 3 = 0, 'good', 'bad')")
              .as("verdict"))
        time("judge_agreement x 60M labels (20M items x 3)")(
          run(graft.ops.Judge.agreement(labels, "event_id", "judge", "verdict")))
      }
    }
    spark.stop()
  }
}
