package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeContainmentLegs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val han26 = "的一是不了人我在有他这为之大来以个中上们到说国和地也"
    val planted = docs.where(col("doc_id") < 3)
      .select((col("doc_id") + 99999).as("doc_id"),
        concat(col("text"), lit(" extra tail words appended here")).as("text"))
    val zh = docs.unionByName(planted).withColumn("text", expr(
      s"IF(doc_id % 3 = 0, replace(translate(lower(text), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text)"))
    for (r <- 1 to 2) {
      time(s"scan winnow_r sets rep$r")(
        zh.select(col("doc_id"), expr("graft_winnow_r(graft_routed_tokens(text, true), 5, 8)").as("fp"))
          .select(col("doc_id"), explode(col("fp"))).queryExecution.toRdd.count())
      time(s"scan winnow MD5 sets rep$r")(
        zh.select(col("doc_id"), expr("graft_winnow(graft_routed_tokens(text, true), 5, 8)").as("fp"))
          .select(col("doc_id"), explode(col("fp"))).queryExecution.toRdd.count())
      time(s"full containmentDedup rep$r")(
        graft.ops.TextAnalysis.containmentDedup(zh, "doc_id", "text",
          k = 5, w = 8, threshold = 0.8, wordGrain = "cjk-auto")
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
