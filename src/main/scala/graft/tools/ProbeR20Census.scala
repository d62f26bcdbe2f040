package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the r20 label-propagation first-iteration unroll: old shape
  * (identity-labels distinct + join) vs new (bucket-min directly off
  * the band rows), both through the census rollup, interleaved in one
  * JVM. `runMain graft.tools.ProbeR20Census <sfDir>`.
  */
object ProbeR20Census {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def bandRows(): DataFrame = {
      val fdf = graft.functions.VectorFunctions.attach(docs)
      graft.ops.Caches.lease(
        graft.ops.Par.floor(fdf.where(expr(
          graft.ops.Dedup.shingleFloorPred("text", 3, "ws"))), col("doc_id"))
        .select(col("doc_id").as("_did"),
          expr("graft_shingle_hashes(split(text, ' '), 3)").as("hs"))
        .select(col("_did"),
          posexplode(expr("graft_band_buckets(hs, 4, 4)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket"))
    }

    def census(labels: DataFrame): DataFrame =
      labels.select(col("_did").as("doc_id"), col("label").as("component_id"))
        .groupBy(col("component_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("cluster_size")).as("n_docs"))
        .withColumn("n_redundant", col("n_docs") - col("n_clusters"))

    def oldLabels(br: DataFrame, iters: Int): DataFrame = {
      var labels = br.select(col("_did"), col("_did").as("label")).distinct()
      (1 to iters).foreach { _ =>
        val bucketMin = br.join(labels, Seq("_did"))
          .groupBy(col("band"), col("bucket")).agg(min(col("label")).as("bmin"))
        labels = br.join(bucketMin, Seq("band", "bucket"))
          .groupBy(col("_did")).agg(min(col("bmin")).as("label"))
      }
      labels
    }

    def newLabels(br: DataFrame, iters: Int): DataFrame = {
      var labels = {
        val bucketMin = br.groupBy(col("band"), col("bucket"))
          .agg(min(col("_did")).as("bmin"))
        br.join(bucketMin, Seq("band", "bucket"))
          .groupBy(col("_did")).agg(min(col("bmin")).as("label"))
      }
      (2 to iters).foreach { _ =>
        val bucketMin = br.join(labels, Seq("_did"))
          .groupBy(col("band"), col("bucket")).agg(min(col("label")).as("bmin"))
        labels = br.join(bucketMin, Seq("band", "bucket"))
          .groupBy(col("_did")).agg(min(col("bmin")).as("label"))
      }
      labels
    }

    for (r <- 1 to 7) {
      time(s"census OLD rep$r")(census(oldLabels(bandRows(), 3)).queryExecution.toRdd.count())
      time(s"census NEW rep$r")(census(newLabels(bandRows(), 3)).queryExecution.toRdd.count())
      time(s"comp   OLD rep$r")(oldLabels(bandRows(), 3).queryExecution.toRdd.count())
      time(s"comp   NEW rep$r")(newLabels(bandRows(), 3).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
