package graft.tools
import org.apache.spark.sql.SparkSession
object SweepDup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val expensive = Seq("regexp_extract_all", "graft_shingle_hashes",
      "graft_minhash_sig", "graft_classifier_logit", "graft_token_count",
      "graft_hyperplane_bucket", "graft_simhash", "graft_fingerprint")
    graft.queries.Queries.queryMap.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val dups = expensive.map(e => e -> e.r.findAllMatchIn(p).length)
          .filter(_._2 > 1)
        if (dups.nonEmpty) println(s"DUP $name: ${dups.map{case(e,n)=>s"$e x$n"}.mkString(", ")}")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
