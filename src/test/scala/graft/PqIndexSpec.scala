package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Pq, PqIndex}

/** Persisted IVF-PQ index: build-once/search-many parity with the
  * in-memory operator, and probe-pruned reads of the codes layout.
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 64).map { i =>
    (i.toLong, Array.tabulate(8)(d => (math.cos(i * 3 + d) * 5).toFloat))
  }.toDF("vec_id", "embedding")

  test("persisted search equals the in-memory IVF-PQ operator") {
    val path = Files.createTempDirectory("graft_pqidx").toString
    PqIndex.write(corpus, "vec_id", "embedding", path,
      dim = 8, m = 2, kSub = 8, iters = 2, nCoarse = 4, coarseIters = 2)
    val queries = corpus.where($"vec_id" < 5)
    val got = PqIndex.searchTopK(spark, path, queries, k = 3,
        dim = 8, m = 2, kSub = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = Pq.ivfPqTopK(corpus, "vec_id", "embedding", k = 3,
        dim = 8, m = 2, kSub = 8, iters = 2,
        nCoarse = 4, coarseIters = 2, nprobe = 2, queryPred = col("v_id") < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.sorted.sameElements(want.sorted),
      s"persisted search must reproduce the in-memory operator:\n${got.toSeq}\nvs\n${want.toSeq}")
  }

  test("persisted RESIDUAL search equals the in-memory residual operator") {
    val path = Files.createTempDirectory("graft_pqidxr").toString
    PqIndex.writeResidual(corpus, "vec_id", "embedding", path,
      dim = 8, m = 2, kSub = 8, iters = 2, nCoarse = 4, coarseIters = 2)
    val queries = corpus.where($"vec_id" < 5)
    val got = PqIndex.searchResidualTopK(spark, path, queries, k = 3,
        dim = 8, m = 2, kSub = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    graft.ops.Caches.releaseAll()
    val want = Pq.ivfPqResidualTopK(corpus, "vec_id", "embedding", k = 3,
        dim = 8, m = 2, kSub = 8, iters = 2,
        nCoarse = 4, coarseIters = 2, nprobe = 2, queryPred = col("v_id") < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    graft.ops.Caches.releaseAll()
    assert(got.sorted.sameElements(want.sorted),
      s"persisted residual search must reproduce the in-memory operator:\n${got.toSeq}\nvs\n${want.toSeq}")
    // the byte-packed at-rest word must score bit-identically
    val packed = PqIndex.searchResidualTopK(spark, path, queries, k = 3,
        dim = 8, m = 2, kSub = 8, nprobe = 2, packed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    graft.ops.Caches.releaseAll()
    assert(packed.sorted.sameElements(got.sorted),
      "packed residual ADC must equal the unpacked kernel")
  }

  test("appendResidual with frozen params equals the one-shot encode of the union") {
    // pathA: the incremental path — build on half-1, append half-2
    val pathA = Files.createTempDirectory("graft_pqinc_a").toString
    PqIndex.writeResidual(corpus.where($"vec_id" < 32), "vec_id", "embedding",
      pathA, dim = 8, m = 2, kSub = 8, iters = 2, nCoarse = 4, coarseIters = 2)
    graft.ops.Caches.releaseAll()
    PqIndex.appendResidual(spark, pathA, corpus.where($"vec_id" >= 32),
      "vec_id", "embedding")
    graft.ops.Caches.releaseAll()
    // pathB: same frozen parameters (built on the SAME half-1, so coarse
    // + codebooks are identical by determinism), then the UNION encoded
    // in one shot into an emptied codes dir
    val pathB = Files.createTempDirectory("graft_pqinc_b").toString
    PqIndex.writeResidual(corpus.where($"vec_id" < 32), "vec_id", "embedding",
      pathB, dim = 8, m = 2, kSub = 8, iters = 2, nCoarse = 4, coarseIters = 2)
    graft.ops.Caches.releaseAll()
    val codesB = new org.apache.hadoop.fs.Path(s"$pathB/codes")
    codesB.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(codesB, true)
    PqIndex.appendResidual(spark, pathB, corpus, "vec_id", "embedding")
    graft.ops.Caches.releaseAll()
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .select($"v_id", $"cluster", expr("array_join(codes, ',')"), hex($"qcodes"),
        round($"xn2", 6))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(codesOf(pathA).sameElements(codesOf(pathB)),
      "appended codes must equal the one-shot union encode under frozen params")
    // and the search over the incremental index equals the search over
    // the one-shot index
    val qs = corpus.where($"vec_id" < 5)
    def searchOf(p: String) = {
      val r = PqIndex.searchResidualTopK(spark, p, qs, k = 3,
          dim = 8, m = 2, kSub = 8, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      graft.ops.Caches.releaseAll()
      r.sorted
    }
    assert(searchOf(pathA).sameElements(searchOf(pathB)))
  }

  test("persisted IVF-FLAT search equals the in-memory k-means IVF operator") {
    val path = Files.createTempDirectory("graft_ivfflat").toString
    PqIndex.writeIvfFlat(corpus, "vec_id", "embedding", path,
      nCentroids = 4, iters = 2)
    graft.ops.Caches.releaseAll()
    val got = PqIndex.searchIvfFlatTopK(spark, path,
        corpus.where($"vec_id" < 5), k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = graft.ops.Similarity.ivfTopKKmeans(corpus, "vec_id", "embedding",
        k = 3, nCentroids = 4, iters = 2, nprobe = 2, queryPred = col("v_id") < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    graft.ops.Caches.releaseAll()
    assert(got.sorted.sameElements(want.sorted),
      s"persisted IVF-flat search must reproduce the in-memory operator:\n${got.toSeq}\nvs\n${want.toSeq}")
  }

  test("appendIvfFlat with frozen centroids equals the one-shot build's search") {
    // incremental: build on half-1, append half-2 under frozen centroids
    val pathA = Files.createTempDirectory("graft_ivfinc_a").toString
    PqIndex.writeIvfFlat(corpus.where($"vec_id" < 32), "vec_id", "embedding",
      pathA, nCentroids = 4, iters = 2)
    graft.ops.Caches.releaseAll()
    PqIndex.appendIvfFlat(spark, pathA, corpus.where($"vec_id" >= 32),
      "vec_id", "embedding")
    // one-shot twin under the SAME centroids (trained on the same half-1)
    val pathB = Files.createTempDirectory("graft_ivfinc_b").toString
    PqIndex.writeIvfFlat(corpus.where($"vec_id" < 32), "vec_id", "embedding",
      pathB, nCentroids = 4, iters = 2)
    graft.ops.Caches.releaseAll()
    val vecsB = new org.apache.hadoop.fs.Path(s"$pathB/vectors")
    vecsB.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(vecsB, true)
    PqIndex.appendIvfFlat(spark, pathB, corpus, "vec_id", "embedding")
    val qs = corpus.where($"vec_id" < 5)
    def searchOf(p: String) =
      PqIndex.searchIvfFlatTopK(spark, p, qs, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sorted
    assert(searchOf(pathA).sameElements(searchOf(pathB)),
      "appended vectors must search identically to the one-shot layout")
  }

  test("the codes scan partition-prunes to the probed clusters only") {
    val path = Files.createTempDirectory("graft_pqidx2").toString
    PqIndex.write(corpus, "vec_id", "embedding", path,
      dim = 8, m = 2, kSub = 8, iters = 2, nCoarse = 4, coarseIters = 2)
    val one = corpus.where($"vec_id" === 0L)
    val q = PqIndex.searchTopK(spark, path, one, k = 3,
      dim = 8, m = 2, kSub = 8, nprobe = 1)
    q.collect()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(s.plan) // stage wrappers report no children
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
    assert(scans.nonEmpty, "codes scan must be a file scan")
    val files = scans.head.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    val clusters = files.flatMap(f => "cluster=([0-9]+)".r.findFirstMatchIn(f).map(_.group(1))).distinct
    assert(clusters.length == 1,
      s"nprobe=1 single query must read exactly one cluster directory, got ${clusters.toSeq}")
  }

  test("pqEncodeAssigned equals pqEncode joined back to cluster (r21 join removal)") {
    // the r21 build-path optimization: cluster rides the encode's group
    // keys instead of a corpus-grain v_id join after the fact — rows
    // must match the join form field-for-field
    val b = graft.functions.VectorFunctions.attach(corpus)
      .select($"vec_id".as("v_id"), $"embedding".as("vec"))
    val coarse = graft.ops.Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", nCentroids = 4, iters = 2)
    val assigned = graft.ops.Similarity.assignClusters(b, broadcast(coarse))
    val cent = Pq.pqCentroids(assigned, "v_id", "vec", dim = 8, m = 2, kSub = 8, iters = 2)
    val got = Pq.pqEncodeAssigned(assigned, cent, m = 2, w = 4)
      .select($"v_id", $"codes", $"xn2", $"cluster")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2), r.getLong(3)))
    val want = Pq.pqEncode(assigned, "v_id", "vec", cent, m = 2, w = 4)
      .join(assigned.select($"v_id", $"cluster"), Seq("v_id"))
      .select($"v_id", $"codes", $"xn2", $"cluster")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2), r.getLong(3)))
    assert(got.sortBy(_._1).sameElements(want.sortBy(_._1)),
      "carrying cluster through the encode aggregates must not change a single code row")
  }
}
