package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

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
    * current plan would run on too few tasks; unchanged otherwise.
    * Batch-only (`df.rdd` is used to read the split count).
    */
  def floor(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target, key) else df
  }
}
