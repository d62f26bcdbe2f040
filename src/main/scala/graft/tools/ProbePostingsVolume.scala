package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePostingsVolume {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val han26 = "的一是不了人我在有他这为之大来以个中上们到说国和地也"
    val zh = docs.withColumn("text", expr(
      s"IF(doc_id % 3 = 0, replace(translate(lower(text), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), text)"))
    val posts = zh.select(col("doc_id"),
      expr("graft_winnow_r(graft_routed_tokens(text, true), 5, 8)").as("fp"))
      .select(col("doc_id"), explode(col("fp")).as("fp"))
    val hist = posts.groupBy("fp").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_fps"),
        sum(col("c")).as("n_posts"),
        max(col("c")).as("max_c"),
        sum(col("c") * (col("c") - 1) / 2).as("pairs_all"),
        sum(when(col("c") <= 1000, col("c") * (col("c") - 1) / 2).otherwise(0)).as("pairs_bounded"))
      .collect()(0)
    println(s"[probe] $hist")
    spark.stop()
  }
}
