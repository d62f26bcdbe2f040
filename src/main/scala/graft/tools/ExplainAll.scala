package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for MANY named queries in one JVM:
  * `runMain graft.tools.ExplainAll <sfDir> <outDir> [q1,q2,...]`
  * (no list = every registered query). One file per query —
  * `<outDir>/<name>.txt` — the round-20 optimization evidence trail
  * (`plans/r20/<q>_before.txt` / `_after.txt`); [[Explain]] stays the
  * single-query console tool.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names: Seq[String] =
      if (args.length > 2) args(2).split(',').toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val all = graft.SparkEntry.queries
    for (name <- names) {
      val plan =
        try all(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explainall] wrote $name")
    }
    spark.stop()
  }
}
