package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 scale probes at the 1M replica corpus:
  *
  *   - the cjk-dict FMM tokenizer at the GROWN lexicon (~1,950 words
  *     vs r14's ~320): per-position probe count is bounded by maxLen-1
  *     hash lookups regardless of table size, so the cost must stay
  *     flat as the table grows — the claim ask r15-2 wants
  *     demonstrated beyond toy size (vs the cjk-auto codepoint walk);
  *   - the thai-dict grain (maxLen 9 → up to 8 probes/position, the
  *     deepest committed ladder) on a Thai-translated corpus;
  *   - the shingle dedup family on the dict grain: minhash keeper at
  *     1M docs, cjk-dict vs cjk-auto — the r15 thread-through's cost
  *     at corpus scale (one extra probe ladder inside the same
  *     one-scan + two-keyed-exchange plan);
  *   - dedupSentences with the size-GATED frequent-set broadcast
  *     (one extra metadata aggregate vs r14's unconditional hint).
  *
  * Usage: runMain graft.tools.ProbeRound15 [probeDir] [what,csv]
  */
object ProbeRound15 {
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val han26 = (0x4E00 until 0x4E1A).map(_.toChar).mkString
    val zh = docs.withColumn("text", expr(
      s"IF(doc_id % 3 = 0, replace(translate(lower(text), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text)"))
    // Thai consonant mapping + a planted phrase of real ThLexicon words
    // so the deep rungs (up to 9 codepoints) actually fire
    val th26 = "กขคงจชญดตถทนบปผฝพฟมยรลวสหอ"
    val thPlant = "ประเทศไทยมีภาษาไทยและอาหารอร่อยมากเราชอบกินข้าวและว่ายน้ำ"
    val th = docs.withColumn("text", expr(
      s"IF(doc_id % 3 = 0, concat(replace(translate(lower(text), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$th26'), ' ', ''), '$thPlant'), text)"))

    if (on("fmm")) {
      time("cjk-dict FMM tokens 1M docs explode (warmup)")(
        zh.select(explode(expr("graft_fmm_tokens(text, false)")))
          .queryExecution.toRdd.count())
      time("cjk-dict FMM tokens 1M docs explode (grown lexicon)")(
        zh.select(explode(expr("graft_fmm_tokens(text, false)")))
          .queryExecution.toRdd.count())
      time("cjk-auto routed tokens 1M docs explode")(
        zh.select(explode(expr("graft_routed_tokens(text, false)")))
          .queryExecution.toRdd.count())
      time("thai-dict FMM tokens 1M docs explode (maxLen 9)")(
        th.select(explode(expr("graft_fmm_tokens(text, false, 'thai-dict')")))
          .queryExecution.toRdd.count())
      time("cjk-dict term_tf vocabulary agg 1M docs")(
        graft.ops.TextAnalysis.vocabulary(zh, "text", topV = 100,
          wordGrain = "cjk-dict").queryExecution.toRdd.count())
    }

    if (on("keeper")) {
      time("minhash keeper 1M docs cjk-auto (baseline)")(
        graft.ops.Dedup.minhashDedupKeepers(zh, "doc_id", "text",
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("minhash keeper 1M docs cjk-dict (r15 thread-through)")(
        graft.ops.Dedup.minhashDedupKeepers(zh, "doc_id", "text",
          wordGrain = "cjk-dict").queryExecution.toRdd.count())
      time("unigram score 1M docs cjk-dict (ref = 1% sample)")(
        graft.ops.TextAnalysis.unigramScore(
          zh.where(col("doc_id") % 100 =!= 0), zh.where(col("doc_id") % 100 === 0),
          "doc_id", "text", vocab = 1000, wordGrain = "cjk-dict")
          .queryExecution.toRdd.count())
    }

    if (on("colloc")) {
      // PMI collocations at corpus scale: two kernel scans + keyed
      // count aggs + two unigram joins + TakeOrdered — the lexicon-
      // induction feed. The cjk-auto leg grams over routed codepoints
      // (the word-discovery configuration, ~6x the ws pair volume)
      time("collocations 1M docs ws (warmup)")(
        graft.ops.TextAnalysis.collocations(docs, "text", topK = 100,
          minCount = 50).queryExecution.toRdd.count())
      time("collocations 1M docs ws")(
        graft.ops.TextAnalysis.collocations(docs, "text", topK = 100,
          minCount = 50).queryExecution.toRdd.count())
      time("collocations 1M docs cjk-auto (zh word discovery)")(
        graft.ops.TextAnalysis.collocations(zh, "text", topK = 100,
          minCount = 50, wordGrain = "cjk-auto").queryExecution.toRdd.count())
    }

    if (on("sentences")) {
      time("dedupSentences 1M docs (size-gated broadcast)")(
        graft.ops.Dedup.dedupSentences(
          zh.select(col("doc_id"), concat(col("text"),
            lit("。请关注我们的公众号。")).as("text")),
          "doc_id", "text", maxFreq = 100).queryExecution.toRdd.count())
    }

    spark.stop()
  }
}
