package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus interchange I/O: JSONL and CSV round-trips and the sharded
  * partitioned writer — the formats a training-data pipeline actually
  * ingests and emits (JSONL is the lingua franca of LLM corpora; the
  * at-rest output is partitioned parquet with bounded file sizes so a
  * downstream loader can schedule per-file).
  *
  * Every round-trip is verified by CONTENT CHECKSUM, not row count: the
  * per-group sum of the engine-portable text hash ([[PortableHash]])
  * recomputed after read-back must equal the oracle's sum over the
  * original table — a single corrupted character anywhere in the corpus
  * changes the sum.
  *
  * Scale notes baked into the API:
  *  - readers take an explicit schema — schema inference is a full
  *    extra pass over 100 TB of text (and JSONL inference can widen
  *    types row-dependently); the pipeline always knows its schema;
  *  - the sharded writer bounds `maxRecordsPerFile` so no reducer can
  *    emit a monolithic file (loaders parallelize per-file), and
  *    partitions by a low-cardinality column only (partitioning by a
  *    high-cardinality key would create a small-files explosion);
  *  - writes go through the normal committer — task retries cannot
  *    double-count (Spark's job commit protocol), which is the
  *    at-least-once sink contract the bus side documents.
  */
object CorpusIO {

  /** One JSON object per line (Spark's native `json` format IS JSONL).
    * Unicode, quotes, and embedded newlines in values are JSON-escaped,
    * so arbitrary document text survives byte-exactly.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL source with an EXPLICIT schema (no inference pass). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV sink/source pair — for flat tables without embedded newlines
    * (events, metrics); document text belongs in JSONL/parquet.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC sink/source — the second columnar at-rest format Spark ships
    * natively (predicate pushdown and column pruning work the same as
    * parquet; the scan side is exercised by the checksum query's
    * two-column projection).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Partitioned parquet writer with bounded file sizes: the at-rest
    * layout of a curated corpus (`path/partitionCol=v/part-*.parquet`,
    * each file ≤ `maxRecordsPerFile` rows).
    */
  def writeSharded(df: DataFrame, path: String, partitionCol: String,
                   maxRecordsPerFile: Int): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Bucketed at-rest layout: co-locate a join/aggregation key at WRITE
    * time. Every later equi-join or groupBy on `key` between tables
    * bucketed the same way runs with ZERO exchange — the single biggest
    * recurring-cost lever for a 100 TB fact table that is joined daily:
    * the shuffle is paid once at ingest, not per query. `sortBy` makes
    * each bucket file key-sorted so sort-merge joins can also skip their
    * sort when files-per-bucket is 1.
    *
    * (`bucketBy` requires a catalog table — buckets are metadata — hence
    * `saveAsTable`, not `parquet(path)`; LayoutSpec proves the
    * exchange-free join and aggregation on the written layout.)
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Content checksum at the `groupCol` grain: doc count, exact char
    * count, id sum, and the sum of the portable text hash. Equal
    * checksums before/after a round-trip prove byte-exact content
    * (hash sums stay far below 2^63: ≤ P·rows ≈ 10^9 · rows).
    */
  def checksum(df: DataFrame, groupCol: String, idCol: String,
               textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"),
        sum(col(idCol)).as("id_sum"),
        sum(expr(PortableHash.sparkStringHash(textCol))).as("text_hash_sum"))

  /** DuckDB twin of [[checksum]] — over the ORIGINAL table: the oracle
    * never sees the round-tripped files, so a lossy write shows up as a
    * checksum mismatch.
    */
  def checksumSql(table: String, groupCol: String, idCol: String,
                  textCol: String): String =
    s"""SELECT $groupCol, count(*) AS n_docs,
       |  CAST(sum(length($textCol)) AS BIGINT) AS n_chars,
       |  CAST(sum($idCol) AS BIGINT) AS id_sum,
       |  CAST(sum(${PortableHash.duckStringHash(textCol)}) AS BIGINT) AS text_hash_sum
       |FROM $table GROUP BY $groupCol""".stripMargin
}
