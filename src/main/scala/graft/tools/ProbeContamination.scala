package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.Decontaminate.contaminationReport]]: 1M-doc
  * corpus vs a 500-item (≈100k distinct shingles) benchmark. Leg 1 is the
  * shipped shape (stream-explode + broadcast hash join — O(1) per corpus
  * shingle); leg 2 is the rejected row-local `array_intersect` probe
  * against the full bench array, whose per-row cost scales with BENCH
  * size. Measured on this box: 6.3s vs 270s — the explode shape wins 43×
  * in the big-bench regime, which is why the report (unlike the
  * small-bench drop operators) uses it.
  */
object ProbeContamination {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val benchIds = docs.select("doc_id").orderBy("doc_id").limit(500)
    val maxBench = benchIds.agg(max(col("doc_id"))).head().getLong(0)
    val bench = docs.where(col("doc_id") <= maxBench)
    val corpus = docs.where(col("doc_id") > maxBench)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("contaminationReport (explode+join)")(
      graft.ops.Decontaminate.contaminationReport(corpus, bench, "doc_id", "text", k = 5)
        .queryExecution.toRdd.count())
    // the rejected shape: row-local intersect against the full broadcast
    // bench array — per-row cost scales with bench size
    val attach = graft.functions.VectorFunctions.attach _
    val benchSh = attach(bench)
      .select(col("doc_id").as("bench_id"),
        explode(expr(graft.ops.Dedup.nativeShingleHashes("text", 5))).as("h"))
      .distinct()
    val benchSet = benchSh.agg(sort_array(collect_set(col("h"))).as("bench_hs"))
    val rowLocal = attach(corpus)
      .select(col("doc_id").as("corpus_id"),
        expr(graft.ops.Dedup.nativeShingleHashes("text", 5)).as("doc_hs"))
      .crossJoin(broadcast(benchSet))
      .select(col("corpus_id"),
        explode(expr("array_intersect(doc_hs, bench_hs)")).as("h"))
      .join(broadcast(benchSh), Seq("h"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("corpus_id")).as("n_corpus_docs"),
        countDistinct(col("h")).as("n_shingles_hit"))
    time("row-local array_intersect (rejected)")(rowLocal.queryExecution.toRdd.count())
    spark.stop()
  }
}
