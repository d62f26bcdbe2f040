package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r20 item 2 — the job-count audit of `embed_ivfpq_persisted`
  * (9.08 s at sf0.1, the board's most expensive line) and the heavy
  * embed legs: a SparkListener tallies every job (count, wall, stage
  * count, task count) per labeled segment, so the fixed-overhead
  * structure (stage launches, tiny-file writes, broadcast builds,
  * localCheckpoints) becomes attributable line by line.
  *
  * `runMain graft.tools.ProbeR21Pq <sfDir> [reps]`
  */
object ProbeR21Pq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)

    case class Seg(var jobs: Int = 0, var stages: Int = 0, var tasks: Int = 0,
                   var wallMs: Long = 0L)
    val segs = scala.collection.mutable.LinkedHashMap.empty[String, Seg]
    val jobStart = scala.collection.mutable.HashMap.empty[Int, (String, Long)]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties.getProperty("spark.job.description"))
          .getOrElse("unlabeled")
        jobStart(e.jobId) = (d, System.nanoTime())
        val s = segs.getOrElseUpdate(d, Seg())
        s.jobs += 1
        s.stages += e.stageInfos.size
        s.tasks += e.stageInfos.map(_.numTasks).sum
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (d, t0) =>
          segs(d).wallMs += (System.nanoTime() - t0) / 1000000
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def seg[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] segment $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    for (r <- 1 to reps) {
      segs.clear()
      println(s"=== rep $r: embed_ivfpq_persisted decomposed ===")
      val path = s"/tmp/probe_r21_pqidx_rep$r"
      val t0 = System.nanoTime()
      // --- PqIndex.write, inlined with labeled segments ---
      val (dim, m, kSub, iters, nCoarse, coarseIters) = (64, 4, 8, 2, 8, 2)
      val w = dim / m
      val coarse = seg("build:kmeansCoarse") {
        graft.ops.Similarity.kmeansCentroids(emb, "vec_id", "embedding", nCoarse, coarseIters)
      }
      seg("build:coarseWrite") {
        coarse.write.mode("overwrite").parquet(s"$path/coarse")
      }
      val b = graft.functions.VectorFunctions.attach(emb)
        .select(col("vec_id").as("v_id"), col("embedding").as("vec"))
      val assigned = graft.ops.Caches.lease(
        graft.ops.Similarity.assignClusters(b, broadcast(coarse)))
      val cent = seg("build:pqCentroids") {
        graft.ops.Pq.pqCentroids(assigned, "v_id", "vec", dim, m, kSub, iters)
      }
      seg("build:centWrite") {
        cent.write.mode("overwrite").parquet(s"$path/codebooks")
      }
      seg("build:encodeWrite") {
        graft.ops.Pq.pqEncode(assigned, "v_id", "vec", cent, m, w)
          .join(assigned.select(col("v_id"), col("cluster")), Seq("v_id"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/codes")
      }
      val searched = seg("search:searchTopK") {
        graft.ops.PqIndex.searchTopK(spark, path,
          emb.where(col("vec_id") < 10).select("vec_id", "embedding"),
          k = 5, dim = 64, m = 4, kSub = 8, nprobe = 2)
          .queryExecution.toRdd.count()
      }
      graft.ops.Caches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[probe] TOTAL ${(System.nanoTime() - t0) / 1e9}%8.3f s (searched rows=$searched)")
      // give the listener bus a beat to drain before reading the tallies
      Thread.sleep(500)
      println(f"[probe] ${"segment"}%-28s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%7s ${"wallMs"}%8s")
      segs.foreach { case (d, s) =>
        println(f"[probe] $d%-28s ${s.jobs}%5d ${s.stages}%7d ${s.tasks}%7d ${s.wallMs}%8d")
      }
    }
    spark.stop()
  }
}
