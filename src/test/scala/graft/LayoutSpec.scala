package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.CorpusIO

/** At-rest layout properties the 100 TB plan depends on: partition
  * pruning over the sharded writer's directory layout, and zero-exchange
  * joins/aggregations over bucketed tables. Correctness tests cannot see
  * either — a pruning regression still returns correct rows while
  * scanning everything.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha text", "src0"), (2L, "beta text", "src0"),
    (3L, "gamma text", "src1"), (4L, "delta text", "src1"),
    (5L, "epsilon text", "src2"), (6L, "zeta text", "src2")
  ).toDF("doc_id", "text", "source")

  test("partition pruning: a partition filter reaches the scan as PartitionFilters") {
    val dir = Files.createTempDirectory("graft_prune").toString
    CorpusIO.writeSharded(docs, dir, "source", maxRecordsPerFile = 100)
    val q = spark.read.parquet(dir).where($"source" === "src1")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.matches("(?s).*PartitionFilters: \\[[^\\]]*src1.*"),
      s"the source predicate must prune directories, not filter rows:\n$p")
    assert(q.count() == 2)
    // the pruned scan must not list the other partitions' files
    val scan = q.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    val scanned = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(scanned.nonEmpty && scanned.forall(_.contains("source=src1")),
      s"only the src1 directory may be read, got:\n${scanned.mkString("\n")}")
  }

  test("bucketed tables: equi-join and groupBy on the bucket key run with zero exchange") {
    val facts = (1L to 100L).map(i => (i % 10, i, s"payload$i")).toDF("k", "seq", "payload")
    val dims = (0L until 10L).map(i => (i, s"dim$i")).toDF("k", "label")
    CorpusIO.writeBucketed(facts, "graft_facts_b", "k", nBuckets = 4)
    CorpusIO.writeBucketed(dims, "graft_dims_b", "k", nBuckets = 4)
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val joined = spark.table("graft_facts_b")
          .join(spark.table("graft_dims_b"), "k")
        val jp = joined.queryExecution.executedPlan.toString
        assert(!jp.contains("Exchange"),
          s"same-bucketing equi-join must not shuffle either side:\n$jp")
        assert(joined.count() == 100)

        val agg = spark.table("graft_facts_b").groupBy("k").agg(sum("seq"))
        val ap = agg.queryExecution.executedPlan.toString
        assert(!ap.contains("Exchange"),
          s"groupBy on the bucket key must aggregate in place:\n$ap")
        assert(agg.count() == 10)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("compaction collapses a small-files layout without losing a byte") {
    import graft.ops.PortableHash
    val in = Files.createTempDirectory("graft_small").toString
    val out = Files.createTempDirectory("graft_compact").toString
    val big = (1L to 2000L).map(i => (i, s"document number $i with some text", "s"))
      .toDF("doc_id", "text", "source")
    big.repartition(50).write.mode("overwrite").parquet(in)
    val before = CorpusIO.checksum(spark.read.parquet(in), "source", "doc_id", "text")
      .collect().toSeq
    val (nBefore, nAfter) = CorpusIO.compact(spark, in, out,
      targetBytes = 64 * 1024, sortCol = Some("doc_id"))
    assert(nBefore == 50, s"fixture must start fragmented, got $nBefore files")
    assert(nAfter < nBefore, s"compaction must reduce file count: $nBefore -> $nAfter")
    val after = CorpusIO.checksum(spark.read.parquet(out), "source", "doc_id", "text")
      .collect().toSeq
    assert(after == before, "content checksum must survive the rewrite")
    // range-clustered rewrite: a doc_id range predicate prunes row groups
    // via min/max stats only if each file holds a contiguous id range —
    // verify disjointness of per-file id ranges
    val ranges = spark.read.parquet(out)
      .select(input_file_name().as("f"), $"doc_id")
      .groupBy($"f").agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file id ranges must be disjoint: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("z-order layout: range predicates on EITHER dimension touch a small file fraction; content exact") {
    val out = Files.createTempDirectory("graft_zorder").toString
    // 64x64 independent grid: x and y carry no joint structure, so a
    // single-column sort could only ever prune its own column
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, x * 64L + y, s"cell $x $y")))
      .toDF("x", "y", "id", "payload")
    val before = CorpusIO.checksum(grid.withColumn("g", lit("all")),
      "g", "id", "payload").collect().toSeq
    CorpusIO.zorderWrite(spark, grid, out, "x", "y", nFiles = 16)
    val back = spark.read.parquet(out)
    val after = CorpusIO.checksum(back.withColumn("g", lit("all")),
      "g", "id", "payload").collect().toSeq
    assert(after == before, "content checksum must survive the rewrite")
    val total = back.select(input_file_name()).distinct().count()
    assert(total >= 8, s"fixture must actually fragment, got $total files")
    def filesTouched(pred: String): Long =
      back.where(pred).select(input_file_name()).distinct().count()
    // a 1/8-wide band on each dimension: z-order confines either band
    // to a minority of files (x-sorted layout would leave the y band
    // smeared over every file)
    val fx = filesTouched("x >= 24 AND x < 32")
    val fy = filesTouched("y >= 24 AND y < 32")
    assert(fx <= total / 2, s"x band must prune: $fx of $total files")
    assert(fy <= total / 2, s"y band must prune: $fy of $total files")
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
