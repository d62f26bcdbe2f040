package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 spread investigation for `embed_ivfpq_persisted` (bench
  * board #1 at 8.2s min-of-2 vs its 4.5s committed denominator with
  * untouched code): decomposes the priced row into its phases —
  * coarse k-means, PQ codebook training, encode+partitioned write,
  * and the search leg — across reps in ONE JVM so JIT/page-cache
  * effects are visible as rep-to-rep deltas rather than folded into
  * a single number.
  */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_probe_ivfpq"
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ivfpq] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    for (rep <- 1 to 3) {
      println(s"[ivfpq] --- rep $rep ---")
      // the coarse-training sub-phase alone (same params write() uses),
      // to apportion the build cost between k-means and encode/write
      t("coarse-kmeans") {
        graft.ops.Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
          .queryExecution.toRdd.count()
      }
      t("full-build") {
        graft.ops.PqIndex.write(emb, "vec_id", "embedding", path,
          dim = 64, m = 4, kSub = 8, iters = 2, nCoarse = 8, coarseIters = 2)
      }
      t("search") {
        graft.ops.PqIndex.searchTopK(spark, path,
          emb.where(col("vec_id") < 10).select("vec_id", "embedding"),
          k = 5, dim = 64, m = 4, kSub = 8, nprobe = 2)
          .queryExecution.toRdd.count()
      }
      graft.ops.Caches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
