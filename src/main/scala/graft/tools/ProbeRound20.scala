package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 scale probe — prices the new answer-scoring / judge /
  * eval families at corpus scale:
  *
  *  1. `emf1`: [[graft.ops.AnswerScore.emF1]] over 1M documents on
  *     both grains — the zero-exchange row-local claim priced (two
  *     regex normalize passes + the clipped-intersection HOF walk per
  *     row, let1-bound token arrays; a baseline scan leg isolates the
  *     scoring cost from the read).
  *  2. `overlap`: [[graft.ops.AnswerScore.overlapNgram]] over 1M
  *     documents — adds the bigram build + second clipped walk.
  *  3. `wkappa`: [[graft.ops.Judge.kappaWeighted]] at 20M labels
  *     (2M items × 10 judges, 5 ordinal categories) next to the
  *     unweighted kappa floor from ProbeRound19's fixture.
  *  4. `nll`: [[graft.ops.PolicyOpt.nllReport]] at 20M step-grain
  *     log-probs (the distributive single-exchange claim).
  *
  * Usage: runMain graft.tools.ProbeRound20 [probeDir] [what,csv]
  * with what from {emf1,overlap,wkappa,nll}. Read rep 2 of each pair
  * (cold-JVM rep 1 swings several-fold).
  */
object ProbeRound20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
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

    // the registered-fixture shape at 1M docs: gold = first 4 cleaned
    // words, pred varies by class (exact-normalized / truncated /
    // extra / disjoint / empty / exact)
    def scored = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("__w", expr(
        "filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '), " +
          "x -> x != '')"))
      .withColumn("gold", expr("array_join(slice(__w, 1, 4), ' ')"))
      .withColumn("pred", expr(
        "CASE cast(doc_id % 6 AS INT) " +
          "WHEN 0 THEN concat('The ', array_join(slice(__w, 1, 4), ' '), '.') " +
          "WHEN 1 THEN array_join(slice(__w, 1, 3), ' ') " +
          "WHEN 2 THEN concat(array_join(slice(__w, 1, 4), ' '), ' unrelated extra') " +
          "WHEN 3 THEN 'zzz qqq' " +
          "WHEN 4 THEN '' " +
          "ELSE array_join(slice(__w, 1, 4), ' ') END"))

    for (rep <- 1 to 2) {
      println(s"[probe] --- rep $rep ---")
      if (on("emf1")) {
        time("fixture-only scan x 1M docs (baseline)")(
          run(scored.select(col("doc_id"), length(col("pred"))
            .cast("long").as("n"), length(col("gold")))))
        time("eval_score_em_f1 x 1M docs (ws grain)")(
          run(graft.ops.AnswerScore.emF1(scored, "doc_id", "pred", "gold")))
        time("eval_score_em_f1 x 1M docs (cjk-auto grain)")(
          run(graft.ops.AnswerScore.emF1(scored, "doc_id", "pred", "gold",
            grain = "cjk-auto")))
      }
      if (on("overlap")) {
        time("eval_overlap_ngram x 1M docs (orders 1+2)")(
          run(graft.ops.AnswerScore.overlapNgram(
            scored, "doc_id", "pred", "gold")))
      }
      if (on("wkappa")) {
        // ProbeRound19's label fixture with ORDINAL categories
        val labels = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("item", expr("event_id % 2000000"))
          .withColumn("judge", expr("concat('j', event_id div 2000000)"))
          .withColumn("score", expr("(event_id + user_id) % 5"))
        time("judge_kappa x 20M labels (unweighted floor)")(
          run(graft.ops.Judge.kappa(
            labels.withColumn("verdict", expr("concat('v', score)")),
            "item", "judge", "verdict")))
        time("judge_kappa_weighted x 20M labels (2M items x 10 judges)")(
          run(graft.ops.Judge.kappaWeighted(
            labels, "item", "judge", "score")))
        time("judge_rank_concordance x 20M labels")(
          run(graft.ops.Judge.rankConcordance(
            labels, "item", "judge", "score")))
      }
      if (on("nll")) {
        val lps = spark.read.parquet(s"$dir/events.parquet")
          .withColumn("policy", expr("concat('p', user_id % 3)"))
          .withColumn("lp", expr(
            "CASE WHEN event_id % 37 = 0 THEN cast(NULL AS BIGINT) " +
              "WHEN event_id % 31 = 0 THEN cast(5 AS BIGINT) " +
              "ELSE cast(-(event_id % 4000) AS BIGINT) END"))
        time("eval_nll_report x 20M tokens")(
          run(graft.ops.PolicyOpt.nllReport(lps, "policy", "lp")))
      }
    }
    spark.stop()
  }
}
