package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT r20 item 5 — the hamming-keeper variance question:
  * `dedup_simhash_keeper[_cjk]`, `mm_phash`, `mm_resize` swung 2-5×
  * across DIFFERENT runs/boxes with no code change (and their low-core
  * scaling ratios said "not CPU-bound"). Decide box noise vs a real
  * skew/partitioning problem: N interleaved reps of the registered
  * queries in ONE JVM, reporting min/median/max per query — a real
  * skew problem reproduces within a run (stable high median, max ≈
  * median); box noise shows a tight in-run spread around a low median.
  *
  * `runMain graft.tools.ProbeR21Variance <sfDir> [reps]`
  */
object ProbeR21Variance {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 7
    val names = Seq("dedup_simhash_keeper", "dedup_simhash_keeper_cjk",
      "mm_phash", "mm_resize")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val samples = scala.collection.mutable.LinkedHashMap
      .empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to reps; n <- names) {
      System.gc()
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      finally {
        graft.ops.Caches.releaseAll()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      val t = (System.nanoTime() - t0) / 1e9
      samples(n) = t :: samples(n)
      println(f"[var] rep$r $n%-28s $t%7.2f s")
    }
    println(f"[var] ${"query"}%-28s ${"min"}%7s ${"med"}%7s ${"max"}%7s  (warm reps only: rep1 dropped)")
    samples.foreach { case (n, ts) =>
      val warm = ts.reverse.drop(1).sorted.toIndexedSeq
      if (warm.nonEmpty)
        println(f"[var] $n%-28s ${warm.head}%7.2f ${warm(warm.size / 2)}%7.2f ${warm.last}%7.2f")
    }
    spark.stop()
  }
}
