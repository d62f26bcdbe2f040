package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scale probes at the 1M replica corpus:
  *
  *   - the COMPILED cjk-auto Gopher grain ([[graft.functions.GopherOps]]
  *     with routing in the byte scan) vs the interpreted routed-HOF
  *     construction it replaces, on a corpus where every 3rd doc is
  *     unsegmented Han (the registered fixture's mechanism) — the r11
  *     verdict's Missing #1 (HOF measured ~43s/1M; ws kernel 2.06s);
  *   - the sorted-array PSL domain/canon probe at 1M urls (r11 ask #5:
  *     ProbeRound11 checked 28 urls cross-engine; this prices the scan
  *     next to r10's 1.84s/1M regex-alternation number).
  *
  * Usage: runMain graft.tools.ProbeRound12 [probeDir] [what,csv]
  */
object ProbeRound12 {
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
      println(f"[probe] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // every 3rd doc unsegmented Han — the registered zh fixture's
    // mechanism (lowercase -> Han translation, spaces removed)
    val han26 = (0x4E00 until 0x4E1A).map(_.toChar).mkString
    val zh = docs.withColumn("text", expr(
      s"IF(doc_id % 3 = 0, replace(translate(lower(text), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text)"))

    if (on("gopher_cjk")) {
      time("gopher cjk-auto KERNEL 1M docs (cold)")(
        graft.ops.TextAnalysis.gopherRules(zh, "doc_id", "text",
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("gopher cjk-auto KERNEL 1M docs (1/3 Han)")(
        graft.ops.TextAnalysis.gopherRules(zh, "doc_id", "text",
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("gopher cjk-auto HOF 1M docs (1/3 Han)")(
        graft.ops.TextAnalysis.gopherRulesHof(zh, "doc_id", "text",
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("gopher ws KERNEL 1M docs (reference)")(
        graft.ops.TextAnalysis.gopherRules(zh, "doc_id", "text")
          .queryExecution.toRdd.count())
    }

    if (on("gopher_en")) {
      // pure-English corpus: isolates the dominance-scan overhead from
      // the routed-row tokenization cost
      time("gopher cjk-auto KERNEL 1M docs (0% Han)")(
        graft.ops.TextAnalysis.gopherRules(docs, "doc_id", "text",
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time("gopher ws KERNEL 1M docs (0% Han)")(
        graft.ops.TextAnalysis.gopherRules(docs, "doc_id", "text")
          .queryExecution.toRdd.count())
    }

    if (on("url")) {
      // 1M urls over the probe ids: mix exact-rule, wildcard, exception,
      // multi-label, and percent-escaped shapes so every kernel branch
      // runs at volume
      val urls = docs.select(col("doc_id"), expr(
        """concat('https://', CASE CAST(doc_id % 5 AS INT)
          |  WHEN 0 THEN concat('shop', doc_id % 1000, '.example.CO.UK:443')
          |  WHEN 1 THEN concat('a', doc_id % 1000, '.b.kawasaki.jp')
          |  WHEN 2 THEN concat('city.kawasaki.jp')
          |  WHEN 3 THEN concat('w', doc_id % 1000, '.example.com:8080')
          |  ELSE concat('x', doc_id % 1000, '.blogspot.com') END,
          |'/Path/', doc_id % 97, '/%7Edoc?b=2&a=', doc_id % 13, '#f')
          |""".stripMargin.replace("\n", " ")).as("url"))
      time("url canon+domain KERNEL 1M urls")(
        urls.select(expr("graft_url_canon(url)").as("c"),
            expr("graft_url_domain(url)").as("d"))
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
