package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the backoff / fertility / cluster-budget additions:
  *  - stupid-backoff scoring at 1M docs (exploded trigram positions
  *    through three broadcast vocab joins, ref = a 5k-doc slice);
  *  - BPE fertility band at 1M docs (zero-shuffle compiled scan);
  *  - cluster-balanced budget at 500k × 64-dim vectors (k-means
  *    assignment + keyed two-pass prefix sum; nClusters scaled to 64 so
  *    cluster size stays ~8k — the "more clusters, not bigger windows"
  *    scale knob).
  *
  * Usage: runMain graft.tools.ProbeRound9d [probeDir] [what,csv]
  */
object ProbeRound9d {
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
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    if (on("backoff")) time("backoffScore (hash joins) 1M docs, V=5000")(
      graft.ops.TextAnalysis.backoffScore(
        docs.where(col("doc_id") >= 5000), docs.where(col("doc_id") < 5000),
        "doc_id", "text", vocab = 5000).queryExecution.toRdd.count())
    if (on("backoff_fast")) time("backoffScoreFast (kernel) 1M docs, V=5000")(
      graft.ops.TextAnalysis.backoffScoreFast(
        docs.where(col("doc_id") >= 5000), docs.where(col("doc_id") < 5000),
        "doc_id", "text", vocab = 5000).queryExecution.toRdd.count())
    if (on("fertility")) time("bpe fertility band 1M docs")(
      graft.functions.VectorFunctions.attach(docs)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          expr(graft.ops.Bpe.sparkTokenCountExpr("text")).as("n_bpe"))
        .withColumn("fertility",
          when(col("n_bpe") > 0,
            round(col("len_chars").cast("double") / col("n_bpe"), 6)))
        .withColumn("keep", col("n_bpe") > 0 && col("fertility").between(1.5, 1.56))
        .queryExecution.toRdd.count())

    if (on("warc")) time("warc render+parse 1M docs (100k blobs)")(
      graft.ops.CorpusIO.parseWarc(
        graft.ops.CorpusIO.warcBlobs(docs, "doc_id", "text"), "blob")
        .queryExecution.toRdd.count())
    if (on("url")) time("url canon+dedup 1M synthetic urls")(
      graft.ops.Url.urlDedupKeepers(
        docs.select(col("doc_id"), expr(
          "concat('https://WWW.Example', cast(doc_id % 1000 AS STRING), " +
            "'.com:443/path/', cast(doc_id % 50000 AS STRING), " +
            "IF(doc_id % 2 = 0, '/?b=2&a=1#frag', '?a=1&b=2'))").as("url")),
        "doc_id", "url").queryExecution.toRdd.count())
    // kernel-vs-declarative A/B for the round-10 RFC 3986 chain: the
    // same canon+domain projection at 1M urls, compiled vs the ~90-op
    // declarative expression tree (spec-pinned bit-equal)
    if (on("url_ab")) {
      val urls = docs.select(col("doc_id"), expr(
        "concat('https://WWW.Example', cast(doc_id % 1000 AS STRING), " +
          "'.co.uk:443/pa', IF(doc_id % 10 = 0, '%74', 't'), 'h/', " +
          "cast(doc_id % 50000 AS STRING), " +
          "IF(doc_id % 2 = 0, '/?b=2&a=1#frag', '?a=1&b=2'))").as("url"))
      time("url canon+domain KERNEL 1M urls")(
        graft.functions.VectorFunctions.attach(urls)
          .select(col("doc_id"), expr("graft_url_canon(url)"),
            expr("graft_url_domain(url)")).queryExecution.toRdd.count())
      time("url canon+domain DECLARATIVE 1M urls")(
        urls.select(col("doc_id"),
          expr(graft.ops.Url.sparkCanonExpr("url")),
          expr(graft.ops.Url.sparkDomainExpr("url"))).queryExecution.toRdd.count())
    }
    if (on("crawl")) time("crawl ingest end-to-end 1M docs")(
      {
        val docsU = docs.withColumn("url", expr(
          "concat('https://WWW.Example', cast(doc_id % 1000 AS STRING), " +
            "'.com:443/path/', cast(doc_id % 300000 AS STRING), " +
            "IF(doc_id % 2 = 0, '/?b=2&a=1#frag', '?a=1&b=2'))"))
        val blobs = graft.ops.CorpusIO.warcBlobs(docsU, "doc_id", "text",
          uriCol = Some("url"))
        val recs = graft.ops.CorpusIO.parseWarcDocs(blobs, "blob")
        val canon = graft.functions.VectorFunctions.attach(recs)
          .select(col("uri"), col("payload"),
            expr("graft_url_canon(uri)").as("canon_url"))
        val filtered = graft.ops.Url.domainFilter(canon, "uri",
          blocked = Seq("example7.com"))
          .withColumn("domain", expr("graft_url_domain(uri)"))
        val reps = filtered.groupBy(col("canon_url"))
          .agg(min(col("payload")).as("payload"), min(col("domain")).as("domain"))
        graft.ops.TextAnalysis.gopherRules(reps, "canon_url", "payload",
            carry = Seq("domain", "payload"))
          .where(col("keep") === 1)
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"))
          .queryExecution.toRdd.count()
      })
    if (on("incnear")) time("incrementalNearDup 100k new vs 900k prior")(
      graft.ops.Dedup.incrementalNearDup(
        docs.where(col("doc_id") < 100000).select("doc_id", "text"),
        graft.ops.Dedup.bandTable(
          docs.where(col("doc_id") >= 100000), "doc_id", "text"),
        "doc_id", "text").queryExecution.toRdd.count())

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    if (on("cluster")) time("clusterBudgetSelect 500k vecs, k=64, B=2000")(
      graft.ops.Similarity.clusterBudgetSelect(emb, "vec_id", "embedding",
        nClusters = 64, iters = 2, perClusterBudget = 2000)
        .queryExecution.toRdd.count())

    spark.stop()
  }
}
