package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.TextAnalysis.winnowPairs]] at 1M docs.
  * The probe corpus plants one boilerplate phrase in EVERY doc (see
  * ProbeSpans), so its fingerprints' posting lists hit corpus size —
  * exactly the degenerate case the maxPostings guard must drop, or the
  * postings self-join squares into 10^12 rows. Also times the selector
  * alone ([[graft.ops.TextAnalysis.winnow]] — the zero-shuffle scan).
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), concat(col("text"),
        lit(" subscribe to our newsletter for more content every day "),
        col("doc_id")).as("text"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("winnow selector")(
      graft.ops.TextAnalysis.winnow(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    time("winnowPairs (guarded)")(
      graft.ops.TextAnalysis.winnowPairs(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
