package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B tfidfKeywords' per-doc top-k: the r20 graft_topk_words heap
  * aggregate vs the row_number window (which Spark 3.5+ already bounds
  * map-side via WindowGroupLimit). Interleaved reps, one JVM:
  * `runMain graft.tools.ProbeR20Tfidf <sfDir>`.
  */
object ProbeR20Tfidf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val han26 = "的一是不了人我在有他这为之大来以个中上们到说国和地也"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text", expr(
        s"IF(doc_id % 3 = 0, replace(translate(lower(text), " +
          s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text)"))
    for (r <- 1 to 5) {
      time(s"tfidf HEAP   cjk rep$r")(
        graft.ops.TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 3,
          wordGrain = "cjk-auto").queryExecution.toRdd.count())
      time(s"tfidf WINDOW cjk rep$r")(
        graft.ops.TextAnalysis.tfidfKeywordsWindow(docs, "doc_id", "text", 3,
          "cjk-auto").queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
