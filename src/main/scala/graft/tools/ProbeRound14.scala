package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scale probes at the 1M replica corpus:
  *
  *   - the ROLLING gram-hash winnow feed (`graft_gram_rhashes` /
  *     `graft_winnow_r` — integer codepoint folds, no gram-string
  *     build, no md5) vs the md5 feed it replaces
  *     (`graft_gram_hashes` / `graft_winnow`) on the
  *     dedup_containment_cjk shape: routed tokens, k=5/w=8 codepoint
  *     grams over a corpus where every 3rd doc is unsegmented Han —
  *     the r13 verdict's ask #5 (md5-over-6×-gram-mass was the
  *     board's 2nd-most-expensive query's dominator);
  *   - the same A/B on the ws grain (k=3/w=4, text_winnow shape) to
  *     show the latin leg rides the same win;
  *   - the cjk-dict FMM tokenizer (`graft_fmm_tokens`, committed
  *     ZhLexicon probes) vs the cjk-auto codepoint kernel — the cost
  *     of real segmentation over the IR fallback.
  *
  * Usage: runMain graft.tools.ProbeRound14 [probeDir] [what,csv]
  */
object ProbeRound14 {
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

    if (on("winnow")) {
      val toks = "graft_routed_tokens(text, true)"
      // FOUR reps of the roll feed: the JVM shows a wild one-time C2
      // recompilation transient on rep 2 of this exact shape (observed
      // 15.5 / 170.1 / 18.7 / 5.0 s — rep2 reproducibly pathological,
      // then steady state), so the honest steady-state number is the
      // LAST rep, vs the md5 feed's stable ~12s (2.3×)
      for (r <- 1 to 4)
        time(s"cjk winnow k=5/w=8 ROLL 1M docs rep$r")(
          zh.select(expr(s"graft_winnow_r($toks, 5, 8)").as("fp"))
            .select(explode(col("fp"))).queryExecution.toRdd.count())
      for (r <- 1 to 2)
        time(s"cjk winnow k=5/w=8 MD5 1M docs rep$r")(
          zh.select(expr(s"graft_winnow($toks, 5, 8)").as("fp"))
            .select(explode(col("fp"))).queryExecution.toRdd.count())
      time("ws winnow k=3/w=4 ROLL 1M docs")(
        docs.select(expr("graft_winnow_r(split(text, ' '), 3, 4)").as("fp"))
          .select(explode(col("fp"))).queryExecution.toRdd.count())
      time("ws winnow k=3/w=4 MD5 1M docs")(
        docs.select(expr("graft_winnow(split(text, ' '), 3, 4)").as("fp"))
          .select(explode(col("fp"))).queryExecution.toRdd.count())
    }

    if (on("sentchunk")) {
      // the zero-shuffle kernel vs the window/groupBy construction it
      // replaced (which shuffles the full text corpus, doc-keyed)
      for (r <- 1 to 2)
        time(s"sentence-chunk KERNEL 1M docs cjk rep$r")(
          graft.ops.TextAnalysis.chunkBySentences(zh, "doc_id", "text",
            size = 64, grain = "cjk-auto").queryExecution.toRdd.count())
      time("sentence-chunk RELATIONAL (window) 1M docs cjk")(
        graft.ops.TextAnalysis.chunkBySentencesRelational(zh, "doc_id", "text",
          size = 64, grain = "cjk-auto").queryExecution.toRdd.count())
    }

    if (on("sentdedup")) {
      // duplicated-sentence removal at 1M docs: the dedupLines plan
      // shape (digest partial-agg + broadcast frequent set + doc-keyed
      // reassembly) at the sentence grain — the replica corpus's v-N
      // suffixes make most sentences unique while the shared prefix
      // sentences cross the maxFreq bar, so the broadcast side is real
      for (r <- 1 to 2)
        time(s"dedupSentences 1M docs (mixed boundaries) rep$r")(
          graft.ops.Dedup.dedupSentences(
            zh.select(col("doc_id"), concat(col("text"),
              lit("。请关注我们的公众号。")).as("text")),
            "doc_id", "text", maxFreq = 100).queryExecution.toRdd.count())
    }

    if (on("fmm")) {
      time("cjk-dict FMM tokens 1M docs explode (warmup)")(
        zh.select(explode(expr("graft_fmm_tokens(text, false)")))
          .queryExecution.toRdd.count())
      time("cjk-dict FMM tokens 1M docs explode")(
        zh.select(explode(expr("graft_fmm_tokens(text, false)")))
          .queryExecution.toRdd.count())
      time("cjk-auto routed tokens 1M docs explode")(
        zh.select(explode(expr("graft_routed_tokens(text, false)")))
          .queryExecution.toRdd.count())
      time("cjk-dict term_tf vocabulary agg 1M docs")(
        graft.ops.TextAnalysis.vocabulary(zh, "text", topV = 100,
          wordGrain = "cjk-dict").queryExecution.toRdd.count())
    }

    spark.stop()
  }
}
