package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import PortableHash._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Every operator is a declarative DataFrame transform built from
  * Catalyst higher-order array functions — no UDFs, no collect — so the
  * plans are: scan → codegen'd projection → (where needed) one hash
  * shuffle. Each op has a DuckDB-dialect twin (the `*Sql` methods) used
  * as its oracle, built on the same [[PortableHash]] arithmetic.
  *
  * Scale notes (100 TB):
  *  - exact dedup: one shuffle on a 128-bit digest; partial-agg combines
  *    map-side, so the exchange carries one row per distinct digest per
  *    map partition, not the corpus.
  *  - minhash LSH: signatures are a linear scan; candidate generation
  *    explodes only (bands) rows per doc and shuffles on (band, bucket) —
  *    the classic shingle→minhash→band→bucket-join pipeline. The exact-
  *    Jaccard verify joins only candidate pairs, never all pairs.
  *  - simhash: linear scan, zero shuffle; near-dup lookup is a self-join
  *    on the (few-bit-prefix) bucket of the fingerprint.
  *  - n-gram Jaccard all-pairs is O(n²) by nature and exists as the
  *    small-side verifier / oracle; the LSH path is the scale path.
  */
object Dedup {

  /** Word k-shingles of a text column, distinct, as an array expression
    * (Spark dialect). Spark SQL lacks let-bindings, so the split is
    * inlined — Catalyst's common-subexpression elimination dedups it.
    */
  def sparkShingles(text: String, k: Int = 3): String = {
    val w = s"split($text, ' ')"
    val parts = (0 until k).map(j => s"element_at($w, i + $j)").mkString(", ' ', ")
    s"array_distinct(transform(sequence(1, greatest(size($w) - ${k - 1}, 0)), i -> concat($parts)))"
  }

  def duckShingles(text: String, k: Int = 3): String = {
    val w = s"string_split($text, ' ')"
    val parts = (0 until k).map(j => s"$w[i + $j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, greatest(len($w) - ${k - 1}, 0)), i -> $parts))"
  }

  /** Exact dedup by content digest: (digest, keep_id = min id, dup count).
    * One partial-aggregated shuffle on md5(text).
    */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("h"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  def exactDedupSql(table: String, id: String, text: String): String =
    s"SELECT md5($text) AS h, min($id) AS keep_id, count(*) AS n_dups FROM $table GROUP BY 1"

  /** MinHash signature: for each doc, `numHashes` minima of universal
    * hashes over its shingle hashes. Pure projection — no shuffle.
    */
  def minhashSignatures(df: DataFrame, id: String, text: String,
                        numHashes: Int = 16, k: Int = 3): DataFrame = {
    val hashes = s"transform(${sparkShingles(text, k)}, s -> ${sparkStringHash("s")})"
    val sigCols = (0 until numHashes).map { i =>
      expr(s"array_min(transform(hs, h -> ${universal(i, "h")}))").as(s"mh$i")
    }
    df.select(col(id), expr(hashes).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col(id) +: sigCols: _*)
  }

  def minhashSignaturesSql(table: String, id: String, text: String,
                           numHashes: Int = 16, k: Int = 3): String = {
    val hashes = s"list_transform(${duckShingles(text, k)}, s -> ${duckStringHash("s")})"
    val sigCols = (0 until numHashes).map { i =>
      s"list_min(list_transform(hs, h -> ${universal(i, "h")})) AS mh$i"
    }.mkString(", ")
    s"SELECT $id, $sigCols FROM (SELECT $id, $hashes AS hs FROM $table) WHERE len(hs) > 0"
  }

  /** MinHash LSH candidate pairs, exact-Jaccard verified.
    * bands × rowsPerBand = numHashes; docs sharing any band bucket are
    * candidates; candidates are verified with exact shingle Jaccard and
    * filtered at `threshold`. Two shuffles: (band, bucket) self-join and
    * the distinct; the verify join touches candidates only.
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String,
                      bands: Int = 4, rowsPerBand: Int = 4, k: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val hashes = s"transform(${sparkShingles("t", k)}, s -> ${sparkStringHash("s")})"
    val sigCols = (0 until numHashes).map { i =>
      expr(s"array_min(transform(hs, h -> ${universal(i, "h")}))").as(s"mh$i")
    }
    val sigsT = df.select(col(id), col(text).as("t"))
      .withColumn("hs", expr(hashes)).where(size(col("hs")) > 0)
      .select(col(id) +: col("t") +: sigCols: _*)
    // band bucket = rolling combine of the band's signature values
    val bandRows = (0 until bands).map { b =>
      val sig = (0 until rowsPerBand).map(r => s"mh${b * rowsPerBand + r}")
        .mkString("array(", ", ", ")")
      sigsT.select(col(id), col("t"),
        lit(b).as("band"), expr(sparkFoldHashes(sig)).as("bucket"))
    }.reduce(_ unionAll _)
    val a = bandRows.select(col(id).as("a_id"), col("t").as("a_text"),
      col("band"), col("bucket"))
    val b = bandRows.select(col(id).as("b_id"), col("t").as("b_text"),
      col("band"), col("bucket"))
    val cand = a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_text", "b_text").distinct()
    val ga = sparkShingles("a_text", k)
    val gb = sparkShingles("b_text", k)
    cand
      .withColumn("c", expr(s"size(array_intersect($ga, $gb))"))
      .withColumn("na", expr(s"size($ga)"))
      .withColumn("nb", expr(s"size($gb)"))
      .withColumn("jaccard", round(col("c") * 1.0 / (col("na") + col("nb") - col("c")), 6))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  def minhashLshPairsSql(table: String, id: String, text: String,
                         bands: Int = 4, rowsPerBand: Int = 4, k: Int = 3,
                         threshold: Double = 0.5): String = {
    val numHashes = bands * rowsPerBand
    val hashes = s"list_transform(${duckShingles(text, k)}, s -> ${duckStringHash("s")})"
    val sigCols = (0 until numHashes).map { i =>
      s"list_min(list_transform(hs, h -> ${universal(i, "h")})) AS mh$i"
    }.mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val sig = (0 until rowsPerBand).map(r => s"mh${b * rowsPerBand + r}")
        .mkString("[", ", ", "]::BIGINT[]")
      s"SELECT $id, $text AS t, $b AS band, ${duckFoldHashes(sig)} AS bucket FROM sigs"
    }.mkString(" UNION ALL ")
    s"""WITH sigs AS (
       |  SELECT $id, $text, $sigCols
       |  FROM (SELECT $id, $text, $hashes AS hs FROM $table) WHERE len(hs) > 0),
       |bandrows AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.$id AS a_id, b.$id AS b_id, a.t AS a_t, b.t AS b_t
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.$id < b.$id),
       |scored AS (
       |  SELECT a_id, b_id,
       |    len(list_intersect(${duckShingles("a_t", k)}, ${duckShingles("b_t", k)})) AS c,
       |    len(${duckShingles("a_t", k)}) AS na, len(${duckShingles("b_t", k)}) AS nb
       |  FROM cand)
       |SELECT a_id, b_id, round(c * 1.0 / (na + nb - c), 6) AS jaccard
       |FROM scored WHERE round(c * 1.0 / (na + nb - c), 6) >= $threshold""".stripMargin
  }

  /** 30-bit SimHash over word hashes (bit j set iff the +1/-1 vote of all
    * token hashes' j-th bits is positive). Linear scan, zero shuffle.
    */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 30): DataFrame = {
    val hashes = s"transform(split($text, ' '), s -> ${sparkStringHash("s")})"
    val sh =
      s"aggregate(transform(sequence(0, ${bits - 1}), j -> IF(" +
        s"aggregate($hashes, cast(0 AS BIGINT), (acc, h) -> acc + ((h div shiftleft(cast(1 AS BIGINT), j)) % 2) * 2 - 1) > 0, " +
        s"shiftleft(cast(1 AS BIGINT), j), cast(0 AS BIGINT))), cast(0 AS BIGINT), (a, b) -> a + b)"
    df.select(col(id), expr(sh).as("simhash"))
  }

  def simhashSql(table: String, id: String, text: String, bits: Int = 30): String = {
    val hashes = s"list_transform(string_split($text, ' '), s -> ${duckStringHash("s")})"
    s"""SELECT $id, list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series(0, ${bits - 1}), j -> CASE WHEN
       |    list_reduce(list_prepend(0::BIGINT, $hashes), (acc, h) -> acc + ((h // (1::BIGINT << j)) % 2) * 2 - 1) > 0
       |    THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b) AS simhash
       |FROM $table""".stripMargin
  }

  /** All-pairs word-k-gram Jaccard above a threshold — the exact near-dup
    * ground truth (O(n²); the verifier/oracle path, not the scale path).
    */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
                        k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val g = df.select(col(id).as("gid"), expr(sparkShingles(text, k)).as("g"))
    val a = g.select(col("gid").as("a_id"), col("g").as("ga"))
    val b = g.select(col("gid").as("b_id"), col("g").as("gb"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("c", expr("size(array_intersect(ga, gb))"))
      .withColumn("jaccard",
        round(col("c") * 1.0 / (expr("size(ga)") + expr("size(gb)") - col("c")), 6))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  def ngramJaccardPairsSql(table: String, id: String, text: String,
                           k: Int = 3, threshold: Double = 0.5): String =
    s"""WITH d AS (SELECT $id, ${duckShingles(text, k)} AS g FROM $table),
       |p AS (SELECT a.$id AS a_id, b.$id AS b_id,
       |        len(list_intersect(a.g, b.g)) AS c, len(a.g) AS na, len(b.g) AS nb
       |      FROM d a JOIN d b ON a.$id < b.$id)
       |SELECT a_id, b_id, round(c * 1.0 / (na + nb - c), 6) AS jaccard
       |FROM p WHERE round(c * 1.0 / (na + nb - c), 6) >= $threshold""".stripMargin
}
