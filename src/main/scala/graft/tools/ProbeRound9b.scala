package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-9 additions: TF-IDF keywords at 1M docs,
  * CMS heavy hitters at 20M events, z-order rewrite at 20M events,
  * acoustic fingerprint + dedup at 200k clips (payloads rendered
  * in-probe — the clip content is a pure function of the id).
  */
object ProbeRound9b {
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
    time("tfidfKeywords 1M docs")(
      graft.ops.TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 3)
        .queryExecution.toRdd.count())
    time("heavyHitters 20M events")(
      graft.ops.Stats.heavyHitters(
        events.withColumn("hh", expr(
          "concat('k', cast(cast(floor(sqrt(cast(user_id % 10000 AS DOUBLE))) AS BIGINT) AS STRING))")),
        "hh", k = 10).queryExecution.toRdd.count())
    time("zorderWrite 20M events") {
      graft.ops.CorpusIO.zorderWrite(spark, events,
        "/tmp/probe_zorder_out", "user_id", "event_id", nFiles = 64)
      spark.read.parquet("/tmp/probe_zorder_out").queryExecution.toRdd.count()
    }
    val clips = spark.range(200000).select(col("id").as("doc_id"))
    val fps = graft.ops.Multimodal.audioFingerprint(
      graft.ops.Multimodal.attachGroupedWavPayload(clips, "doc_id")).toDF()
    time("audioFingerprint 200k clips")(fps.queryExecution.toRdd.count())
    time("dedupAudioKeepers 200k clips")(
      graft.ops.Multimodal.dedupAudioKeepers(
        graft.ops.Caches.lease(fps)).queryExecution.toRdd.count())
    spark.stop()
  }
}
