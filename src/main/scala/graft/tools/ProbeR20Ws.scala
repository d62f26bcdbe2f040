package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the r20 postings lease on the WS-grain containment fixture
  * (`dedup_containment`), where the full-board run read the leased op
  * 1.4x SLOWER while the kernel-heavy dict/cjk legs halved:
  * ws fingerprints are a plain space-split, so the lease may buy less
  * recompute than its cache serialization costs. Interleaved reps in
  * one JVM; `runMain graft.tools.ProbeR20Ws <sfDir>`.
  */
object ProbeR20Ws {
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
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val planted = base.where(col("doc_id") < 3)
      .select((col("doc_id") + 99999).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text"))
    val df = base.unionByName(planted)
    val (id, text, k, w, minShared, maxPostings, threshold) =
      ("doc_id", "text", 3, 4, 2, 1000, 0.8)

    def boundedOf(lease: Boolean): DataFrame = {
      val sets = graft.ops.TextAnalysis.winnowSets(df, id, text, k, w, "ws")
        .select(col(id).as("d"), col("fingerprints"))
      val posts = sets.select(col("d"), explode(col("fingerprints")).as("fp"))
      val b = posts.withColumn("cnt",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .where(col("cnt") <= maxPostings).drop("cnt")
        .withColumn("n_fp",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("d"))))
      if (lease) graft.ops.Caches.lease(b) else b
    }

    def full(b: DataFrame): DataFrame = {
      val pairs = b.select(col("d").as("a_id"), col("n_fp").as("n_a"), col("fp"))
        .join(b.select(col("d").as("b_id"), col("n_fp").as("n_b"), col("fp")), Seq("fp"))
        .where(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .where(col("n_shared") >= minShared)
        .select(col("a_id"), col("b_id"),
          round(col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))
      val victims = pairs.where(col("containment") >= threshold)
        .select(col("b_id").as("victim")).distinct()
      df.select(col(id)).join(victims, col(id) === col("victim"), "left_anti")
        .select(col(id))
    }

    for (r <- 1 to 6) {
      time(s"ws NO-lease rep$r")(full(boundedOf(false)).queryExecution.toRdd.count())
      time(s"ws LEASED  rep$r")(full(boundedOf(true)).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
