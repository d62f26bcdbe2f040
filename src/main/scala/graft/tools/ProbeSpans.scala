package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val docs = graft.functions.VectorFunctions.attach(
      spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), concat(col("text"),
        lit(" subscribe to our newsletter for more content every day "),
        col("doc_id")).as("text2"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  (rows=$n)")
    }
    val grams = docs.select(col("doc_id"),
      posexplode(expr("graft_ngrams(split(text2, ' '), 5)")).as(Seq("spos", "gram")))
      .select(col("doc_id"), col("spos"), md5(col("gram")).as("gh"))
    val dup = grams.groupBy(col("gh")).agg(count(lit(1)).as("c")).where(col("c") > 10)
    time("dup agg")(dup.queryExecution.toRdd.count())
    val cov = grams.join(broadcast(dup), Seq("gh"))
      .groupBy(col("doc_id")).agg(sort_array(collect_set(col("spos"))).as("__ss"))
    time("cov (re-gram + join + agg)")(cov.queryExecution.toRdd.count())
    val joined = docs.select(col("doc_id"), expr("split(text2, ' ')").as("__w"))
      .join(cov, Seq("doc_id"), "left_outer")
    time("docs join cov")(joined.queryExecution.toRdd.count())
    time("full dedupSpans")(graft.ops.Dedup.dedupSpans(docs, "doc_id", "text2",
      spanLen = 5, maxFreq = 10).queryExecution.toRdd.count())
    spark.stop()
  }
}
