package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 1M-doc probe for the round-9 closers: normalization, corpus profile,
  * normalized dedup, leakage-safe grouped split, CMS probe.
  */
object ProbeRound9 {
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
    time("normalize 1M docs")(
      graft.ops.TextAnalysis.normalize(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    time("corpusProfile 1M docs")(
      graft.ops.TextAnalysis.corpusProfile(docs, "lang", "source",
        "text", "n_chars").queryExecution.toRdd.count())
    time("normalize+exactDedup 1M docs")(
      graft.ops.Dedup.exactDedup(
        graft.ops.TextAnalysis.normalize(docs, "doc_id", "text"),
        "doc_id", "norm_text").queryExecution.toRdd.count())
    time("splitAssignGrouped 1M docs")(
      graft.ops.Sampling.splitAssignGrouped(docs, "doc_id",
        graft.ops.Dedup.minhashDedupComponents(docs, "doc_id", "text"),
        "doc_id", "component_id", valPct = 2, testPct = 2)
        .queryExecution.toRdd.count())
    time("cmsProbe 20M-event corpus sketch")(
      graft.ops.Stats.cmsProbe(
        graft.ops.Stats.cmsCounters(events, "event_type"),
        events.where(col("user_id") < 5000), "event_type")
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
