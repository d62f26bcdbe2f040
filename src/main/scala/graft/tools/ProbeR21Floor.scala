package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT r20 item 3 — decompose the per-query FIXED cost that makes
  * the ~200-query sub-second tail stage-launch/overhead-bound at sf0.1:
  * for representative queries, time (a) DataFrame construction (the
  * registered closure: parquet footer/schema reads + Dataset analysis),
  * (b) physical planning (executedPlan force), (c) the action itself.
  * Also times a bare `spark.read.parquet` schema inference, the unit
  * cost the closures pay per `t()` call. Interleaved reps, one JVM.
  *
  * `runMain graft.tools.ProbeR21Floor <sfDir> [q1,q2,...]`
  */
object ProbeR21Floor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq
      else Seq("text_fingerprint", "sink_count", "topk_orders",
        "dedup_url", "grpo_group_stats", "embed_quantize_packed")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    for (r <- 1 to 4) {
      println(s"=== rep $r ===")
      var t0 = System.nanoTime()
      spark.read.parquet(s"$dir/documents.parquet")
      println(f"[floor] bare read.parquet schema-infer ${ms(t0)}%8.1f ms")
      for (n <- names) {
        t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val tConstruct = ms(t0)
        t0 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = ms(t0)
        t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val tRun = ms(t0)
        graft.ops.Caches.releaseAll()
        println(f"[floor] $n%-28s construct $tConstruct%8.1f ms  plan $tPlan%8.1f ms  run $tRun%8.1f ms")
      }
    }
    spark.stop()
  }
}
