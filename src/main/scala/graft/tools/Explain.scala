package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one named query over a data dir:
  * `runMain graft.tools.Explain <queryName> <sfDir>`. The plan-shape
  * audits in PlanAuditSpec pin the critical shapes at sf0.001; this tool
  * inspects how AQE/stats re-shape them at other scales.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
