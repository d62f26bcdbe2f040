package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-9 additions: BM25 over 1M docs, the sketch
  * family (HLL global/by-key, CMS, log-quantile) over 20M events, and
  * perceptual-hash image dedup with REAL PNG decode at 100k images.
  * Probe data: /tmp/probe_1m (200× sf0.1 — see the verify skill for the
  * duckdb regeneration recipe).
  */
object ProbeSketches {
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
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")

    time("bm25TopK 1M docs")(
      graft.ops.TextAnalysis.bm25TopK(docs, "doc_id", "text",
        terms = Seq("dup", "vector", "spark"), k = 25)
        .queryExecution.toRdd.count())
    time("hllRegisters 20M events")(
      graft.ops.Stats.hllRegisters(events, "cast(event_id AS STRING)")
        .queryExecution.toRdd.count())
    time("hllRegistersByKey 20M events")(
      graft.ops.Stats.hllRegistersByKey(events, "event_type",
        "cast(user_id AS STRING)").queryExecution.toRdd.count())
    time("cmsCounters 20M events")(
      graft.ops.Stats.cmsCounters(events, "event_type")
        .queryExecution.toRdd.count())
    time("logQuantileSketch 20M events")(
      graft.ops.Stats.logQuantileSketch(events, "value")
        .queryExecution.toRdd.count())

    // 100k REAL PNG payloads rendered + decoded + dHashed + deduped:
    // 25k near-dup groups of 4 — the banding must collapse each group
    val ids = docs.select(col("doc_id")).limit(100000)
    val phashed = graft.ops.Multimodal.perceptualHash(
      graft.ops.Multimodal.attachGroupedPngPayload(ids, "doc_id")).toDF()
    time("perceptualHash 100k PNGs")(phashed.queryExecution.toRdd.count())
    val hashes = phashed.persist()
    println(s"[probe] phash corpus materialized: ${hashes.count()} rows")
    time("dedupPhashKeepers 100k (hashes cached)")(
      graft.ops.Multimodal.dedupPhashKeepers(hashes)
        .queryExecution.toRdd.count())
    hashes.unpersist()
    spark.stop()
  }
}
