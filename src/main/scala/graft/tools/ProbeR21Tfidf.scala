package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The r21 audit of the r20 `graft_topk_words` landing (VERDICT item 1):
  * for EVERY registered tfidf variant, dump the formatted plan of the
  * heap form (after) and the row_number-window form (before) to files
  * under `plans/r21/`, then interleave timing reps of both forms at the
  * bench SF. One JVM, reps interleaved — read rep 2+ of each pair.
  *
  * `runMain graft.tools.ProbeR21Tfidf <sfDir> [plansDir]`
  */
object ProbeR21Tfidf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val plansDir = if (args.length > 1) args(1) else null
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)

    val variants: Seq[(String, String)] =
      graft.queries.Queries.tfidfVariantGrain.toSeq.sortBy(_._1)

    def fmt(df: DataFrame): String = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    if (plansDir != null) {
      new java.io.File(plansDir).mkdirs()
      for ((q, grain) <- variants) {
        // the registered query (heap form) = after; window form over the
        // SAME fixture frame = before — the diff is window → heap only
        val after = graft.SparkEntry.queries(q)(spark, dir)
        val before = graft.ops.TextAnalysis.tfidfKeywordsWindow(
          graft.queries.Queries.tfidfVariantDocs(q)(spark, dir),
          "doc_id", "text", 3, grain)
        def write(p: String, s: String): Unit = {
          val w = new java.io.PrintWriter(p, "UTF-8")
          try w.write(s) finally w.close()
        }
        write(s"$plansDir/${q}_before.txt", fmt(before))
        write(s"$plansDir/${q}_after.txt", fmt(after))
        graft.ops.Caches.releaseAll()
        println(s"[probe] plans written for $q")
      }
    }

    def time(label: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // alternate pair order per rep: a fixed order would hand the
    // second form a page-cache/JIT warmth edge every time
    for (r <- 1 to 4; (q, grain) <- variants) {
      val docs = graft.queries.Queries.tfidfVariantDocs(q)(spark, dir)
      def heap(): Unit = time(s"$q HEAP   rep$r")(
        graft.ops.TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 3,
          wordGrain = grain).queryExecution.toRdd.count())
      def win(): Unit = time(s"$q WINDOW rep$r")(
        graft.ops.TextAnalysis.tfidfKeywordsWindow(docs, "doc_id", "text", 3,
          grain).queryExecution.toRdd.count())
      if (r % 2 == 1) { heap(); win() } else { win(); heap() }
    }
    spark.stop()
  }
}
