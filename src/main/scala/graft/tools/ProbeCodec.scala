package graft.tools
import org.apache.spark.sql.SparkSession

/** At-rest compression lever probe: the same 1M-doc corpus written as
  * parquet under each codec, reporting compressed bytes and write /
  * full-read wall time. At 100 TB the codec choice IS a top-line cost
  * knob: storage footprint scales the fleet's disk bill, decode speed
  * scales every later scan.
  */
object ProbeCodec {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def dirBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) { total += it.next().getLen }
      total
    }

    for (codec <- Seq("snappy", "zstd", "gzip", "lz4")) {
      val out = s"/tmp/probe_codec_$codec"
      val t0 = System.nanoTime()
      docs.write.mode("overwrite").option("compression", codec).parquet(out)
      val tw = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = spark.read.parquet(out).queryExecution.toRdd.count()
      val tr = (System.nanoTime() - t1) / 1e9
      println(f"[probe] codec=$codec%-7s bytes=${dirBytes(out) / 1e6}%8.1f MB" +
        f"  write=$tw%6.2f s  read=$tr%6.2f s  (rows=$n)")
    }
    spark.stop()
  }
}
