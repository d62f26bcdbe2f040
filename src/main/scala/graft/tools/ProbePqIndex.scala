package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the persisted-index split the design claims: build ONCE
  * (coarse + codebooks + encode + partitioned write), then search many
  * times touching only the probed clusters' files.
  *
  * Usage: runMain graft.tools.ProbePqIndex <embeddingsDir> [nCoarse]
  */
object ProbePqIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCoarse = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_probe"

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (_, tBuild) = time {
      graft.ops.PqIndex.write(emb, "vec_id", "embedding", path,
        dim = 64, m = 4, kSub = 8, iters = 2, nCoarse = nCoarse, coarseIters = 2)
    }
    val queries = emb.where(col("vec_id") < 10).select("vec_id", "embedding")
      .localCheckpoint(true)
    // warm, then median of 3 searches
    def search() = graft.ops.PqIndex.searchTopK(spark, path, queries,
      k = 5, dim = 64, m = 4, kSub = 8, nprobe = 2)
      .queryExecution.toRdd.count()
    search()
    val ts = (1 to 3).map(_ => time(search())._2).sorted
    println(s"""{"metric":"pq_index","build_sec":$tBuild,"search_sec":${ts(1)},"nCoarse":$nCoarse,"dir":"$dir"}""")

    // the residual family's split on the same corpus and parameters
    val rpath = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_probe_res"
    val (_, tBuildR) = time {
      graft.ops.PqIndex.writeResidual(emb, "vec_id", "embedding", rpath,
        dim = 64, m = 4, kSub = 8, iters = 2, nCoarse = nCoarse, coarseIters = 2)
    }
    graft.ops.Caches.releaseAll()
    def searchR() = graft.ops.PqIndex.searchResidualTopK(spark, rpath, queries,
      k = 5, dim = 64, m = 4, kSub = 8, nprobe = 2)
      .queryExecution.toRdd.count()
    searchR()
    val tsR = (1 to 3).map(_ => time(searchR())._2).sorted
    println(s"""{"metric":"pq_index_residual","build_sec":$tBuildR,"search_sec":${tsR(1)},"nCoarse":$nCoarse,"dir":"$dir"}""")

    // the exact-vector tier: IVF-flat (coarse + cluster-partitioned full
    // vectors) — same split, no quantization loss, ~dim× the at-rest
    // bytes of the PQ layouts (the tiering trade made visible)
    val fpath = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_probe_flat"
    val (_, tBuildF) = time {
      graft.ops.PqIndex.writeIvfFlat(emb, "vec_id", "embedding", fpath,
        nCentroids = nCoarse, iters = 2)
    }
    graft.ops.Caches.releaseAll()
    def searchF() = graft.ops.PqIndex.searchIvfFlatTopK(spark, fpath, queries,
      k = 5, nprobe = 2)
      .queryExecution.toRdd.count()
    searchF()
    val tsF = (1 to 3).map(_ => time(searchF())._2).sorted
    println(s"""{"metric":"ivf_flat_index","build_sec":$tBuildF,"search_sec":${tsF(1)},"nCoarse":$nCoarse,"dir":"$dir"}""")
    spark.stop()
  }
}
