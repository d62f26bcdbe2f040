package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 scale probe: mojibake repair and the chunk manifest at the
  * 1M-doc replica corpus.
  * Usage: runMain graft.tools.ProbeRound10 [probeDir] [what,csv]
  */
object ProbeRound10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // corrupt every 3rd doc through the real mechanism, as the
    // registered fixture does
    val moji = " " + graft.ops.Mojibake.mojibakeOf(
      "café ’quoted’ «guille» – dash… 90° ¡sí! ñandú")
    val dirty = docs.withColumn("text",
      expr(s"concat(text, IF(doc_id % 3 = 0, '$moji', ''))"))
    if (on("mojibake")) time("mojibake repair 1M docs (1/3 dirty)")(
      graft.ops.Mojibake.fix(dirty, "doc_id", "text")
        .queryExecution.toRdd.count())
    if (on("chunk_manifest")) time("chunk manifest 1M docs (size=32)")(
      graft.ops.TextAnalysis.chunkManifest(docs, "doc_id", "text",
        size = 32, stride = 32).queryExecution.toRdd.count())
    if (on("datacard")) time("datacard 1M docs (one scan, no joins)")(
      graft.ops.Datacard.datacard(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    // gopher kernel vs the declarative HOF construction, same JVM
    if (on("gopher")) {
      time("gopher rules KERNEL 1M docs")(
        graft.ops.TextAnalysis.gopherRules(docs, "doc_id", "text")
          .queryExecution.toRdd.count())
      time("gopher rules HOF 1M docs")(
        graft.ops.TextAnalysis.gopherRulesHof(docs, "doc_id", "text")
          .queryExecution.toRdd.count())
    }
    // the optimizer-rule rung: the SAME user-authored declarative word
    // count, without and with KernelizeTextOps installed
    if (on("kernelize")) {
      val q = "size(filter(split(text, ' '), w -> w <> '')) AS n"
      time("user word-count DECLARATIVE 1M docs")(
        docs.selectExpr("doc_id", q).queryExecution.toRdd.count())
      graft.plans.KernelizeTextOps.install(spark)
      time("user word-count RULE-KERNELIZED 1M docs")(
        docs.selectExpr("doc_id", q).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
