package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scale probes at the 1M replica corpus:
  *
  *   - the COMPILED routed tokenizer (`graft_routed_tokens` /
  *     grain-parameterized `graft_term_counts`) vs the declarative
  *     regexp construction it replaces on the retrieval/keyword legs
  *     (r12 verdict Missing #1): raw tokenize+explode, end-to-end
  *     TF-IDF keywords, and the BM25 doc-stats projection, each on a
  *     corpus where every 3rd doc is unsegmented Han;
  *   - the LENGTH-DELIMITED WARC walk (r12 rewrite) at 1M docs with
  *     embedded `WARC/1.0\r\n` marker bytes mixed into every 20th
  *     payload — the r12 verdict's ask #5: the framing rewrite changed
  *     the parse's inner loop but had no at-scale number next to r9's
  *     17.4s render+parse.
  *
  * Usage: runMain graft.tools.ProbeRound13 [probeDir] [what,csv]
  */
object ProbeRound13 {
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
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)
    import graft.ops.TextAnalysis

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val han26 = (0x4E00 until 0x4E1A).map(_.toChar).mkString
    val zh = docs.withColumn("text", expr(
      s"IF(doc_id % 3 = 0, replace(translate(lower(text), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text)"))

    if (on("tokens")) {
      // the isolated tokenize cost: same explode consumer, kernel vs
      // the regexp construction (dominance regexp_replace + token
      // regexp_extract_all per row)
      time("routed tokens KERNEL 1M docs explode (cold)")(
        zh.select(explode(expr(
          TextAnalysis.routedTokensSpark("text", keepEmpties = false))))
          .queryExecution.toRdd.count())
      time("routed tokens KERNEL 1M docs explode")(
        zh.select(explode(expr(
          TextAnalysis.routedTokensSpark("text", keepEmpties = false))))
          .queryExecution.toRdd.count())
      time("routed tokens REGEX 1M docs explode")(
        zh.select(explode(expr(
          TextAnalysis.routedTokensRegex("text", keepEmpties = false))))
          .queryExecution.toRdd.count())
      time("ws tokens (filter-split HOF) 1M docs explode")(
        zh.select(explode(expr("filter(split(text, ' '), w -> w <> '')")))
          .queryExecution.toRdd.count())
    }

    if (on("tfidf")) {
      time("tfidf keywords cjk-auto (kernel grain) 1M docs")(
        TextAnalysis.tfidfKeywords(zh, "doc_id", "text", k = 3,
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("tfidf keywords ws 1M docs (reference)")(
        TextAnalysis.tfidfKeywords(zh, "doc_id", "text", k = 3)
          .queryExecution.toRdd.count())
    }

    if (on("bm25")) {
      // doc-stats projection is the changed stage; whole query timed
      val hanTerms = Seq(han26.substring(0, 1), han26.substring(1, 2))
      time("bm25 topk cjk-auto (routed term_counts) 1M docs")(
        TextAnalysis.bm25TopK(zh, "doc_id", "text",
          terms = hanTerms, k = 25, wordGrain = "cjk-auto")
          .queryExecution.toRdd.count())
      time("bm25 topk ws 1M docs (reference)")(
        TextAnalysis.bm25TopK(zh, "doc_id", "text",
          terms = Seq("the", "and"), k = 25)
          .queryExecution.toRdd.count())
    }

    if (on("grams")) {
      // the n-gram pair kernel vs the HOF-child + per-gram-explode
      // construction it replaced (bigram/trigram scoring's inner stage)
      // row counts differ by design: pairs land at DISTINCT-gram grain
      // (52.3M rows) where the HOF form emits every occurrence (54.1M)
      time("bigram pairs KERNEL 1M docs explode (distinct grain)")(
        docs.select(explode(expr("graft_gram_tf(text, 2)")))
          .queryExecution.toRdd.count())
      time("bigram HOF-child+ngrams 1M docs explode (occurrences)")(
        docs.select(explode(expr(
          "graft_ngrams(filter(split(text, ' '), w -> w <> ''), 2)")))
          .queryExecution.toRdd.count())
      time("bigram score END-TO-END 1M docs (pair kernel)")(
        TextAnalysis.bigramScore(
          docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
          "doc_id", "text").queryExecution.toRdd.count())
    }

    if (on("dedup")) {
      // the linear keeper pass with routed shingling at 1M docs (1/3
      // unsegmented Han): prices the codepoint-shingle tokenize next
      // to the ws form on the same corpus (which silently EXCLUDES
      // the Han third — fewer rows, less work, blind)
      time("minhash keeper cjk-auto 1M docs (1/3 Han)")(
        graft.ops.Dedup.minhashDedupKeepers(zh, "doc_id", "text",
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("minhash keeper ws 1M docs (Han third excluded)")(
        graft.ops.Dedup.minhashDedupKeepers(zh, "doc_id", "text")
          .queryExecution.toRdd.count())
    }

    if (on("warc")) {
      // every 20th payload embeds the literal record marker — the
      // length-delimited walk must stride over it (the pre-r12 marker
      // scan split these records); 100 docs per container blob
      val tricky = docs.withColumn("text", expr(
        "IF(doc_id % 20 = 0, concat(text, ' see WARC/1.0\r\n as bytes'), text)"))
      val blobs = graft.ops.CorpusIO.warcBlobsBytes(
        tricky, "doc_id", "text", docsPerBlob = 100)
      // render-only prices the container side; render+parse minus it
      // isolates the walk (parsing CACHED blobs instead measures
      // binary-blob cache deserialization, not the parse — observed
      // 88s of storage/GC overhead on the 10k persisted container rows)
      time("WARC render 1M docs -> byte containers")(
        blobs.queryExecution.toRdd.count())
      time("WARC render+parse 1M (r9 comparable)")(
        graft.ops.CorpusIO.parseWarcBytes(
          graft.ops.CorpusIO.warcBlobsBytes(tricky, "doc_id", "text",
            docsPerBlob = 100), "blob")
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
