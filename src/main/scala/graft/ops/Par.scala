package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Parallelism floor for CPU-dense stages.
  *
  * A stage's task count is the input's split count. For a 100 TB corpus
  * that is thousands of splits and this helper is a NO-OP. But a narrow
  * input — one tiny file, a single parquet row group, a gzip member —
  * yields ONE task, and a CPU-dense projection downstream (shingle
  * hashing, embedding dot products, codec work) then pins the whole
  * stage to one core while the rest of the cluster idles.
  *
  * [[floor]] redistributes only in that degenerate case: when the scan's
  * split count is at most half the cluster's default parallelism, insert
  * one hash repartition on the row key before the heavy compute. Keyed
  * hash partitioning (not round-robin) avoids Spark's
  * sort-before-repartition pass and gives downstream self-joins on the
  * same key a reusable partitioning. An explicit numPartitions is
  * deliberately used so AQE does not re-coalesce the exchange back to
  * one partition (the rows are few BYTES but expensive CPU — byte-based
  * coalescing is the wrong heuristic here).
  */
object Par {

  /** `df` hash-partitioned on `key` to `defaultParallelism` iff its
    * scan would run on too few tasks; unchanged otherwise.
    */
  def floor(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanSplits(df) * 2 <= target) df.repartition(target, key) else df
  }

  /** Estimated file-scan split count, read from the ANALYZED plan's file
    * indexes with Spark's own split-sizing formula
    * (`FilePartition.maxSplitBytes`: bytes-per-core vs maxPartitionBytes
    * vs openCostInBytes). Needs only analysis — the previous
    * `df.rdd.getNumPartitions` instantiated a full physical plan per
    * call, a measurable per-query planner tax on short queries.
    *
    * Non-file leaves (memory streams, local relations) count as
    * already-parallel (Spark slices local data to defaultParallelism),
    * so the floor no-ops on them — same behavior as before.
    */
  private def estimatedScanSplits(df: DataFrame): Long = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val fileRels = df.queryExecution.analyzed.collectLeaves().collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation]
    }
    if (fileRels.isEmpty) Long.MaxValue
    else fileRels.map { fs =>
      val nFiles = fs.location.inputFiles.length.toLong
      val padded = fs.location.sizeInBytes + nFiles * conf.filesOpenCostInBytes
      val minPartitionNum = conf.filesMinPartitionNum
        .getOrElse(spark.sparkContext.defaultParallelism)
      val maxSplit = math.min(conf.filesMaxPartitionBytes,
        math.max(conf.filesOpenCostInBytes,
          padded / math.max(1, minPartitionNum)))
      if (padded == 0L) 1L else (padded + maxSplit - 1) / maxSplit
    }.sum
  }
}
