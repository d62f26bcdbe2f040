package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the binary/DSIR/soft-dedup additions:
  *  - binaryTopK vs exact brute force at 500k × 64-dim vectors (the
  *    crossover evidence for the 1-bit prefilter: phase 1 scans 8-byte
  *    sketches, phase 2 touches |Q|·rerank float vectors);
  *  - DSIR selection at 1M docs (two corpus scans + broadcast bucket
  *    table);
  *  - soft-dedup weights at 1M docs (component labeling dominated).
  *
  * Usage: runMain graft.tools.ProbeRound9c [probeDir]
  */
object ProbeRound9c {
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
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      graft.ops.Caches.releaseAll()
    }
    val what = if (args.length > 1) args(1).split(',').toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what(k)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 10)
    if (on("sketch")) time("binary sketch scan 500k vecs")(
      graft.functions.VectorFunctions.attach(emb)
        .select(col("vec_id"), expr("graft_binary_sketch(embedding, 63)"))
        .queryExecution.toRdd.count())
    if (on("brute")) time("bruteForceTopK 500k vecs, 10q, k=10")(
      graft.ops.Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 10).queryExecution.toRdd.count())
    if (on("binary")) time("binaryTopK 500k vecs, rerank=100")(
      graft.ops.Similarity.binaryTopK(emb, queries,
        "vec_id", "embedding", k = 10, rerank = 100)
        .queryExecution.toRdd.count())
    if (on("recall")) time("binaryRecall@10 500k vecs, rerank=100")(
      graft.ops.Eval.binaryRecallAtK(emb, queries,
        "vec_id", "embedding", k = 10, rerank = 100)
        .queryExecution.toRdd.count())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    if (on("dsir")) time("dsirSelectFast 1M docs, n=1000")(
      graft.ops.Dsir.selectFast(docs, "doc_id", "text",
        col("lang") === "en", n = 1000).queryExecution.toRdd.count())
    if (on("dsir1")) time("dsir pass1 bucket counts 1M docs")(
      graft.functions.VectorFunctions.attach(docs)
        .select((col("lang") === "en").as("__is_t"),
          explode(expr("graft_dsir_buckets(text, 256)")).as("b"))
        .groupBy(col("b")).agg(
          sum(when(col("__is_t"), 1L).otherwise(0L)),
          count(lit(1)))
        .queryExecution.toRdd.count())
    if (on("dsir2")) time("dsir pass2 kernel score 1M docs") {
      val wLit = Array.fill(256)(1L).mkString("array(", "L, ", "L)")
      graft.functions.VectorFunctions.attach(docs)
        .select(col("doc_id"), expr("graft_dsir_buckets(text, 256)").as("__b"))
        .where(expr("size(__b) > 0"))
        .select(col("doc_id"), expr("cast(size(__b) AS BIGINT)").as("n_grams"),
          expr(s"graft_bucket_score(__b, $wLit)").as("w_sum"))
        .queryExecution.toRdd.count()
    }
    if (on("dsirslow")) time("dsirSelect (declarative) 1M docs")(
      graft.ops.Dsir.select(docs, "doc_id", "text",
        col("lang") === "en", n = 1000).queryExecution.toRdd.count())
    if (on("dsir2b")) time("dsir pass2 single-ref 1M docs") {
      val wLit = Array.fill(256)(1L).mkString("array(", "L, ", "L)")
      graft.functions.VectorFunctions.attach(docs)
        .where(trim(col("text")) =!= "")
        .select(col("doc_id"),
          expr("cast(2 * size(filter(split(text, ' '), w -> w <> '')) - 1 AS BIGINT)").as("n_grams"),
          expr(s"graft_bucket_score(graft_dsir_buckets(text, 256), $wLit)").as("w_sum"))
        .queryExecution.toRdd.count()
    }
    if (on("dsir2c")) time("dsir pass2 kernel-only 1M docs") {
      val wLit = Array.fill(256)(1L).mkString("array(", "L, ", "L)")
      graft.functions.VectorFunctions.attach(docs)
        .select(col("doc_id"),
          expr(s"graft_bucket_score(graft_dsir_buckets(text, 256), $wLit)").as("w_sum"))
        .queryExecution.toRdd.count()
    }
    if (on("dsir2d")) time("dsir pass2 ngrams-only 1M docs") {
      graft.functions.VectorFunctions.attach(docs)
        .select(col("doc_id"),
          expr("cast(2 * size(filter(split(text, ' '), w -> w <> '')) - 1 AS BIGINT)").as("n_grams"))
        .queryExecution.toRdd.count()
    }
    if (on("soft")) time("softDedupWeights 1M docs")(
      graft.ops.Dedup.softDedupWeights(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    if (on("vocab")) time("vocabulary topV=50k 1M docs")(
      graft.ops.TextAnalysis.vocabulary(docs, "text", topV = 50000)
        .queryExecution.toRdd.count())
    if (on("band")) time("qualityBand 1M docs")(
      graft.ops.Sampling.qualityBand(docs, "doc_id", "lang", "n_chars")
        .queryExecution.toRdd.count())
    if (on("curated")) time("curatedSelect (band->DSIR) 1M docs")(
      graft.ops.Dsir.selectFast(
        graft.ops.Sampling.qualityBandAll(docs, "lang", "n_chars"),
        "doc_id", "text", col("lang") === "en", n = 1000)
        .queryExecution.toRdd.count())
    if (on("hardneg")) time("hardNegatives 200k vecs, 10q")(
      graft.ops.Similarity.hardNegatives(emb, queries,
        "vec_id", "embedding", "label", k = 10)
        .queryExecution.toRdd.count())
    if (on("bitext")) time("bitextMine 1k src x 200k tgt")(
      graft.ops.Similarity.bitextMine(
        emb.withColumn("label",
          expr("IF(vec_id < 1000, 0, IF(vec_id % 3 = 1, 1, 2))")),
        "vec_id", "embedding", "label", srcLabel = 0, tgtLabel = 1)
        .queryExecution.toRdd.count())
    if (on("bitextshort")) time("bitextMineShortlist 1k x 200k, R=50")(
      graft.ops.Similarity.bitextMineShortlist(
        emb.withColumn("label",
          expr("IF(vec_id < 1000, 0, IF(vec_id % 3 = 1, 1, 2))")),
        "vec_id", "embedding", "label", srcLabel = 0, tgtLabel = 1,
        rerank = 50).queryExecution.toRdd.count())
    if (on("binpersist")) {
      val path = "/tmp/probe_binsk_idx"
      time("writeBinary index 200k vecs")(
        { graft.ops.PqIndex.writeBinary(emb, "vec_id", "embedding", path); 1L })
      time("searchBinary persisted 200k vecs")(
        graft.ops.PqIndex.searchBinaryTopK(spark, path,
          queries.select("vec_id", "embedding"), k = 10, rerank = 100)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
