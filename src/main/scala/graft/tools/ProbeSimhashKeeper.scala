package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeSimhashKeeper {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet("/tmp/probe_1m/documents.parquet")
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.simhashKeepers(docs, "doc_id", "text")
      .queryExecution.toRdd.count()
    println(f"[probe] simhashKeepers 1M docs ${(System.nanoTime()-t0)/1e9}%8.2f s (rows=$n)")
    spark.stop()
  }
}
