package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-rep timing probe for the REGISTERED mm_* queries (VERDICT r8 #7):
  * runs each leg `reps` times in one JVM and prints every rep, so any
  * leg still paying fixture RENDER inside the timer shows up as a
  * rep-1 outlier — with the first-touch persisted payloads
  * (Queries.mediaPayloads), rep 1 may pay the one-time ensure() write
  * on a cold tmpdir, and every later rep must read within noise of the
  * others (decode over at-rest bytes).
  *
  * Usage: runMain graft.tools.ProbeMmReps [sfDir] [reps]
  */
object ProbeMmReps {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mm = graft.queries.Queries.queryMap.keys.filter(_.startsWith("mm_")).toSeq.sorted
    // warm codegen/JIT per query shape at the smallest SF so rep-to-rep
    // deltas attribute to the data path (same rationale as Bench)
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      mm.foreach { n =>
        try graft.queries.Queries.queryMap(n)(spark, warm).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
        finally graft.ops.Caches.releaseAll()
      }
    mm.foreach { n =>
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        try graft.queries.Queries.queryMap(n)(spark, dir).queryExecution.toRdd.count()
        finally graft.ops.Caches.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      val later = ts.drop(1)
      val ratio = ts.head / (later.sum / later.size)
      println(f"[probe] $n%-22s reps=${ts.map(t => f"$t%.2f").mkString(",")}  rep1/laterMean=$ratio%.2f")
    }
    spark.stop()
  }
}
