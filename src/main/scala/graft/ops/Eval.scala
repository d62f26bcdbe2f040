package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index-quality evaluation and per-class embedding statistics — the
  * measurement half of the ANN surface: an approximate index you cannot
  * score against ground truth is not an index, and at 100 TB the recall
  * check IS the (sampled) production gate for rebuild/re-tune decisions.
  */
object Eval {

  /** The recall join every gate shares: exact vs ANY approximate
    * (q_id, c_id) frame — per query, the fraction of the true top-k the
    * approximate side returned. Exposed so the registered gates can
    * point the approximate side at a FIRST-TOUCH PERSISTED index search
    * ([[PqIndex.searchTopK]] & co.) instead of an in-query rebuild: the
    * gate then times search + the (by-definition) exact brute-force
    * side, never index construction — the same build/search attribution
    * split the *_topk queries already have, and the production shape
    * (you build once, then gate on a sampled query set).
    */
  def recallOf(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact.select(col("q_id"), col("c_id"))
      .join(approx.select(col("q_id"), col("c_id"), lit(1L).as("__hit")),
        Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("recall", round(col("n_matched").cast("double") / k, 6))

  /** Recall@k of the LSH multi-probe ANN path ([[Similarity.lshTopK]])
    * against exact brute force ([[Similarity.bruteForceTopK]]) on the
    * same query set: per query, the fraction of the true top-k the index
    * returned. The standard ANN quality metric, computed engine-side.
    *
    * Plan shape: both sides are the existing broadcast-queries ×
    * one-corpus-scan ops with bounded-heap top-k, so each side's
    * exchange carries ≤ queries × k × partitions rows; the comparison
    * join and per-query count are over ≤ queries × k rows — driver-free
    * end to end. At 100 TB you run this on a SAMPLED query set (the
    * operator takes any query frame), never the full corpus: the exact
    * side is a deliberate full scan per evaluation.
    */
  def annRecallAtK(corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int,
                   bits: Int = 8, nprobe: Int = 2): DataFrame = {
    val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("q_id"), col("c_id"))
    val approx = Similarity.lshTopK(corpus, queries, idCol, vecCol, k, bits, nprobe)
      .select(col("q_id"), col("c_id"), lit(1L).as("__hit"))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("recall", round(col("n_matched").cast("double") / k, 6))
  }

  /** [[annRecallAtK]] for the OTHER index family: recall@k of the
    * k-means IVF multi-probe path ([[Similarity.ivfTopKKmeans]]) against
    * exact brute force — together the two recall gates cover both
    * registered ANN index shapes (hash-bucketed and learned-centroid).
    * `queryPred` filters the assigned corpus exactly as the IVF operator
    * does, so both sides see the same query set.
    */
  def ivfRecallAtK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                   nCentroids: Int = 8, iters: Int = 2, nprobe: Int = 2,
                   queryPred: org.apache.spark.sql.Column): DataFrame = {
    // queryPred follows ivfTopKKmeans' convention (it references the id
    // as `v_id`); expose the same name here so ONE predicate selects the
    // identical query set on both the exact and the index side
    val queries = corpus.select(col(idCol).as("v_id"), col(vecCol))
      .where(queryPred)
      .select(col("v_id").as(idCol), col(vecCol))
    val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("q_id"), col("c_id"))
    val approx = Similarity.ivfTopKKmeans(corpus, idCol, vecCol, k,
        nCentroids, iters, nprobe, queryPred = queryPred)
      .select(col("q_id"), col("c_id"), lit(1L).as("__hit"))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("recall", round(col("n_matched").cast("double") / k, 6))
  }

  /** DuckDB twin of [[annRecallAtK]]: the existing exact/LSH SQL twins
    * nested as derived tables (so each keeps its own WITH chain), then
    * the same left-join overlap count.
    */
  def annRecallAtKSql(table: String, idCol: String, vecCol: String, k: Int,
                      queryPred: String, bits: Int = 8, nprobe: Int = 2): String =
    s"""WITH exact AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.bruteForceTopKSql(table, idCol, vecCol, k, queryPred)}) t),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.lshTopKSql(table, idCol, vecCol, k, queryPred, bits, nprobe)}) t)
       |SELECT e.q_id,
       |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  round(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
       |GROUP BY e.q_id""".stripMargin

  /** DuckDB twin of [[ivfRecallAtK]]. The two predicate strings are the
    * SAME query-set filter spelled in each side's column naming
    * (`queryPredId` over the table's id column for the exact CTE,
    * `queryPredVid` over `v_id` for the IVF CTE chain).
    */
  def ivfRecallAtKSql(table: String, idCol: String, vecCol: String, k: Int,
                      queryPredId: String, queryPredVid: String,
                      nCentroids: Int = 8, iters: Int = 2,
                      nprobe: Int = 2): String =
    s"""WITH exact AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.bruteForceTopKSql(table, idCol, vecCol, k, queryPredId)}) t),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.ivfTopKKmeansSql(table, idCol, vecCol, k, nCentroids, iters, nprobe, queryPredVid)}) t)
       |SELECT e.q_id,
       |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  round(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
       |GROUP BY e.q_id""".stripMargin

  /** [[annRecallAtK]] for the THIRD index family: recall@k of PQ/ADC
    * search ([[Pq.pqTopK]]) against exact brute force. PQ is the lossy
    * tier (codes, not vectors), so this gate is what says whether a
    * given (m, kSub) keeps enough signal — the production tuning loop is
    * "raise m/kSub until pqRecallAtK clears the bar".
    */
  def pqRecallAtK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                  dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                  queryPred: org.apache.spark.sql.Column = lit(false)): DataFrame = {
    val queries = corpus.select(col(idCol).as("v_id"), col(vecCol))
      .where(queryPred)
      .select(col("v_id").as(idCol), col(vecCol))
    val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("q_id"), col("c_id"))
    val approx = Pq.pqTopK(corpus, idCol, vecCol, k, dim, m, kSub, iters, queryPred)
      .select(col("q_id"), col("c_id"), lit(1L).as("__hit"))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("recall", round(col("n_matched").cast("double") / k, 6))
  }

  /** DuckDB twin of [[pqRecallAtK]] (same nesting shape as
    * [[ivfRecallAtKSql]]).
    */
  def pqRecallAtKSql(table: String, idCol: String, vecCol: String, k: Int,
                     queryPredId: String, queryPredVid: String,
                     dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2): String =
    s"""WITH exact AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.bruteForceTopKSql(table, idCol, vecCol, k, queryPredId)}) t),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |${Pq.pqTopKSql(table, idCol, vecCol, k, dim, m, kSub, iters, queryPredVid)}) t)
       |SELECT e.q_id,
       |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  round(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
       |GROUP BY e.q_id""".stripMargin

  /** Recall@k of the combined IVF-PQ path ([[Pq.ivfPqTopK]]) — the gate
    * that prices BOTH approximations at once (routing loss × code
    * loss); production tunes (nprobe, m, kSub) against this single
    * number.
    */
  def ivfPqRecallAtK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                     dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                     nCoarse: Int = 8, coarseIters: Int = 2, nprobe: Int = 2,
                     queryPred: org.apache.spark.sql.Column = lit(false)): DataFrame = {
    val queries = corpus.select(col(idCol).as("v_id"), col(vecCol))
      .where(queryPred)
      .select(col("v_id").as(idCol), col(vecCol))
    val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("q_id"), col("c_id"))
    val approx = Pq.ivfPqTopK(corpus, idCol, vecCol, k, dim, m, kSub, iters,
        nCoarse, coarseIters, nprobe, queryPred)
      .select(col("q_id"), col("c_id"), lit(1L).as("__hit"))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("recall", round(col("n_matched").cast("double") / k, 6))
  }

  def ivfPqRecallAtKSql(table: String, idCol: String, vecCol: String, k: Int,
                        queryPredId: String, queryPredVid: String,
                        dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                        nCoarse: Int = 8, coarseIters: Int = 2,
                        nprobe: Int = 2): String =
    s"""WITH exact AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.bruteForceTopKSql(table, idCol, vecCol, k, queryPredId)}) t),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |${Pq.ivfPqTopKSql(table, idCol, vecCol, k, dim, m, kSub, iters, nCoarse, coarseIters, nprobe, queryPredVid)}) t)
       |SELECT e.q_id,
       |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  round(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
       |GROUP BY e.q_id""".stripMargin

  /** Recall@k of the RESIDUAL IVF-PQ path ([[Pq.ivfPqResidualTopK]]) —
    * the gate that demonstrates what residual encoding buys at equal
    * code budget: with identical (m, kSub, nprobe), this number should
    * meet or beat [[ivfPqRecallAtK]] (PqSpec pins the ordering on a
    * planted fixture; here the driver pins the values cross-engine).
    */
  def ivfPqResidualRecallAtK(corpus: DataFrame, idCol: String, vecCol: String,
                             k: Int, dim: Int, m: Int = 4, kSub: Int = 8,
                             iters: Int = 2, nCoarse: Int = 8,
                             coarseIters: Int = 2, nprobe: Int = 2,
                             queryPred: org.apache.spark.sql.Column = lit(false)): DataFrame = {
    val queries = corpus.select(col(idCol).as("v_id"), col(vecCol))
      .where(queryPred)
      .select(col("v_id").as(idCol), col(vecCol))
    val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("q_id"), col("c_id"))
    val approx = Pq.ivfPqResidualTopK(corpus, idCol, vecCol, k, dim, m, kSub,
        iters, nCoarse, coarseIters, nprobe, queryPred)
      .select(col("q_id"), col("c_id"), lit(1L).as("__hit"))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("recall", round(col("n_matched").cast("double") / k, 6))
  }

  def ivfPqResidualRecallAtKSql(table: String, idCol: String, vecCol: String,
                                k: Int, queryPredId: String, queryPredVid: String,
                                dim: Int, m: Int = 4, kSub: Int = 8,
                                iters: Int = 2, nCoarse: Int = 8,
                                coarseIters: Int = 2, nprobe: Int = 2): String =
    s"""WITH exact AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.bruteForceTopKSql(table, idCol, vecCol, k, queryPredId)}) t),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |${Pq.ivfPqResidualTopKSql(table, idCol, vecCol, k, dim, m, kSub, iters, nCoarse, coarseIters, nprobe, queryPredVid)}) t)
       |SELECT e.q_id,
       |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  round(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
       |GROUP BY e.q_id""".stripMargin

  /** Per-label centroid (exact-decimal per-dimension mean, the
    * [[Similarity.kmeansCentroids]] arithmetic keyed by a label column
    * instead of a learned assignment) plus the class size — the
    * class-prototype statistic behind centroid classifiers, drift
    * monitoring, and class-balanced sampling.
    *
    * Plan shape: posexplode → one partial-aggregated keyed shuffle of
    * (label, dim) cells → per-label rebuild. The exchange carries ≤
    * labels × dims rows per map task — never the vectors. Decimal
    * summation keeps the mean independent of row order (double addition
    * is not associative; DECIMAL is), so both engines agree bit-for-bit.
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("double").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("v"),
        count(lit(1)).as("cnt"))
      .groupBy(col("label"))
      .agg(max(when(col("pos") === 0, col("cnt"))).as("n_vectors"),
        array_sort(collect_list(struct(col("pos"), col("v")))).as("s"))
      .select(col("label"), col("n_vectors"),
        expr("transform(s, x -> round(x.v, 6))").as("centroid"))

  /** DuckDB twin of [[labelCentroids]] — same decimal-exact mean;
    * DuckDB's 1-based UNNEST index vs Spark's 0-based pos only orders
    * dimensions, it never reaches the output.
    */
  /** Inter-class centroid separation — the embedding-quality report
    * next to [[labelCentroids]]: pairwise cosine between every label
    * pair's centroid (well-separated classes ⇒ the embedding carries
    * the label signal; near-1 pairs flag classes the representation
    * cannot distinguish — the eval a curation team runs before trusting
    * embedding-based dedup/filtering on a new encoder). The centroid
    * frame is labels × dim (metadata) — the pair join is a broadcast
    * over L(L−1)/2 rows; the corpus cost is [[labelCentroids]]'s one
    * scan. Cosine via the declarative HOF twin over the ROUNDED
    * centroids both engines already hash-agree on.
    */
  def centroidSeparation(df: DataFrame, labelCol: String,
                         vecCol: String): DataFrame = {
    // leased: both join sides reference the centroid frame — an
    // uncached plan would re-run the corpus aggregation per side
    val cents = Caches.lease(labelCentroids(df, labelCol, vecCol))
    val a = cents.select(col("label").as("label_a"), col("centroid").as("ca"),
      col("n_vectors").as("n_a"))
    val b = cents.select(col("label").as("label_b"), col("centroid").as("cb"),
      col("n_vectors").as("n_b"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        expr(s"round(${Similarity.sparkCosine("ca", "cb")}, 6)").as("cos_sim"))
  }

  /** DuckDB twin of [[centroidSeparation]]. */
  def centroidSeparationSql(table: String, labelCol: String,
                            vecCol: String): String =
    s"""WITH cents AS (
       |${labelCentroidsSql(table, labelCol, vecCol)})
       |SELECT a.label AS label_a, b.label AS label_b,
       |  a.n_vectors AS n_a, b.n_vectors AS n_b,
       |  round(${Similarity.duckCosine("a.centroid", "b.centroid")}, 6) AS cos_sim
       |FROM cents a JOIN cents b ON a.label < b.label""".stripMargin

  /** Per-label CENTROID DRIFT between two embedding snapshots (round
    * 20) — the encoder-version check next to [[centroidSeparation]]
    * (separation asks "are the classes distinct"; drift asks "did
    * re-embedding MOVE them"): rows carry a `side` column splitting
    * reference from current (a new encoder, a re-crawl, a quantized
    * re-export), and the report gives per label both class sizes and
    * the cosine between the two sides' decimal-exact centroids. A
    * label present on only one side reports its counts with a NULL
    * cosine (a vanished class is the headline finding, not a dropped
    * row). The engine-wide zero-magnitude convention applies:
    * cos(0⃗, ·) = 0.
    *
    * Plan shape: ONE corpus scan into the [[labelCentroids]]
    * (side × label × dim) partial-agged exchange; everything after is
    * the (2 × labels)-row metadata frame — the full-outer label join
    * never touches vectors. Same rounded-centroid hash discipline as
    * [[centroidSeparation]].
    */
  def centroidDrift(df: DataFrame, side: String, refValue: String,
                    labelCol: String, vecCol: String): DataFrame = {
    val cents = Caches.lease(
      df.select(when(col(side) === lit(refValue), "r").otherwise("c").as("__s"),
        col(labelCol).as("label"), posexplode(col(vecCol)))
        .groupBy(col("__s"), col("label"), col("pos"))
        .agg((sum(col("col").cast("double").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("v"),
          count(lit(1)).as("cnt"))
        .groupBy(col("__s"), col("label"))
        .agg(max(when(col("pos") === 0, col("cnt"))).as("n_vectors"),
          array_sort(collect_list(struct(col("pos"), col("v")))).as("s"))
        .select(col("__s"), col("label"), col("n_vectors"),
          expr("transform(s, x -> round(x.v, 6))").as("centroid")))
    val ref = cents.where(col("__s") === "r")
      .select(col("label"), col("n_vectors").as("n_ref"),
        col("centroid").as("cr"))
    val cur = cents.where(col("__s") === "c")
      .select(col("label"), col("n_vectors").as("n_cur"),
        col("centroid").as("cc"))
    ref.join(cur, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        expr("IF(cr IS NULL OR cc IS NULL, cast(NULL AS DOUBLE), " +
          s"round(${Similarity.sparkCosine("cr", "cc")}, 6))").as("cos_sim"))
  }

  /** DuckDB twin of [[centroidDrift]]. */
  def centroidDriftSql(table: String, side: String, refValue: String,
                       labelCol: String, vecCol: String): String =
    s"""WITH cells AS (
       |  SELECT CASE WHEN $side = '$refValue' THEN 'r' ELSE 'c' END AS s,
       |    $labelCol AS label, pos,
       |    CAST(sum(CAST(($vecCol)[pos]::DOUBLE AS DECIMAL(28,12))) AS DOUBLE)
       |      / count(*) AS v,
       |    count(*) AS cnt
       |  FROM $table, UNNEST(generate_series(1, len($vecCol))) AS t(pos)
       |  GROUP BY 1, 2, 3),
       |cents AS (
       |  SELECT s, label, max(CASE WHEN pos = 1 THEN cnt END) AS n_vectors,
       |    list(round(v, 6) ORDER BY pos) AS centroid
       |  FROM cells GROUP BY 1, 2),
       |r AS (SELECT label, n_vectors AS n_ref, centroid AS cr
       |      FROM cents WHERE s = 'r'),
       |c AS (SELECT label, n_vectors AS n_cur, centroid AS cc
       |      FROM cents WHERE s = 'c')
       |SELECT coalesce(r.label, c.label) AS label,
       |  coalesce(r.n_ref, 0)::BIGINT AS n_ref,
       |  coalesce(c.n_cur, 0)::BIGINT AS n_cur,
       |  CASE WHEN r.cr IS NULL OR c.cc IS NULL THEN NULL
       |       ELSE round(${Similarity.duckCosine("r.cr", "c.cc")}, 6)
       |  END AS cos_sim
       |FROM r FULL OUTER JOIN c ON r.label = c.label""".stripMargin

  /** Planted-copy recall gate for the NEAR-DUP KEEPER family — the
    * dedup analog of the ANN recall gates (an approximate dedup you
    * cannot score against planted ground truth is a hope, not an
    * operator): append a marker suffix to the first `nPlant` docs as
    * known near-dup copies at `offset` ids, run the LSH keeper over the
    * union, and report in one row how many planted copies collapsed
    * back below the offset (recall) next to how much of the BASE corpus
    * merged among itself (the baseline the recall is read against —
    * organic near-dups, not errors). All arithmetic exact integers;
    * recall in milli-units via integer division.
    *
    * Banding math makes the expected recall visible: a 3-word suffix on
    * an n-word doc leaves Jaccard ≈ (n−2)/(n+1); with 4×4 banding the
    * copy shares ≥ 1 bucket w.p. 1−(1−J⁴)⁴ — ~0.999 at 100 words. The
    * gate MEASURES it instead of assuming it, per corpus, which is the
    * rebuild/re-tune signal at 100 TB (dropping recall = docs got
    * shorter or bands need retuning).
    */
  def dedupRecall(base: DataFrame, id: String, text: String,
                  nPlant: Int, offset: Long = 1000000L,
                  suffix: String = " planted trailing copy"): DataFrame = {
    require(nPlant > 0, "dedupRecall needs planted copies (nPlant > 0) " +
      "— recall over an empty plant set is 0/0")
    val copies = base.where(col(id) < nPlant)
      .select((col(id) + offset).as(id),
        concat(col(text), lit(suffix)).as(text))
    val union = base.select(col(id), col(text)).unionByName(copies)
    Dedup.minhashDedupKeepers(union, id, text)
      .agg(
        sum(when(col("doc_id") >= offset, 1L).otherwise(0L)).as("n_planted"),
        sum(when(col("doc_id") >= offset && col("keep_id") < offset, 1L)
          .otherwise(0L)).as("n_recalled"),
        sum(when(col("doc_id") < offset, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("doc_id") < offset && col("keep_id") =!= col("doc_id"), 1L)
          .otherwise(0L)).as("n_base_merged"))
      .withColumn("recall_milli",
        expr("(1000 * n_recalled) div n_planted"))
  }

  /** DuckDB twin of [[dedupRecall]]. */
  def dedupRecallSql(table: String, id: String, text: String,
                     nPlant: Int, offset: Long = 1000000L,
                     suffix: String = " planted trailing copy"): String = {
    val uni = s"""(SELECT $id, $text FROM $table
                 | UNION ALL
                 | SELECT $id + $offset AS $id, $text || '$suffix' AS $text
                 | FROM $table WHERE $id < $nPlant)""".stripMargin
    s"""WITH keep AS (
       |${Dedup.minhashDedupKeepersSql(uni, id, text)})
       |SELECT
       |  count(*) FILTER (WHERE doc_id >= $offset)::BIGINT AS n_planted,
       |  count(*) FILTER (WHERE doc_id >= $offset AND keep_id < $offset)::BIGINT AS n_recalled,
       |  count(*) FILTER (WHERE doc_id < $offset)::BIGINT AS n_base,
       |  count(*) FILTER (WHERE doc_id < $offset AND keep_id <> doc_id)::BIGINT AS n_base_merged,
       |  ((1000 * count(*) FILTER (WHERE doc_id >= $offset AND keep_id < $offset))
       |    // count(*) FILTER (WHERE doc_id >= $offset))::BIGINT AS recall_milli
       |FROM keep""".stripMargin
  }

  def labelCentroidsSql(table: String, labelCol: String, vecCol: String): String =
    s"""WITH cells AS (
       |  SELECT $labelCol AS label, pos,
       |    CAST(sum(CAST(($vecCol)[pos]::DOUBLE AS DECIMAL(28,12))) AS DOUBLE)
       |      / count(*) AS v,
       |    count(*) AS cnt
       |  FROM $table, UNNEST(generate_series(1, len($vecCol))) AS t(pos)
       |  GROUP BY $labelCol, pos)
       |SELECT label, max(CASE WHEN pos = 1 THEN cnt END) AS n_vectors,
       |       list(round(v, 6) ORDER BY pos) AS centroid
       |FROM cells GROUP BY label""".stripMargin

  /** Recall@k of the binary sign-sketch two-phase path
    * ([[Similarity.binaryTopK]]) against exact brute force — the gate
    * that tells a user how much candidate quality the 1-bit prefilter
    * costs at a given `rerank` budget (the knob: recall rises toward
    * 1.0 as `rerank` grows, while phase-2 cost stays |Q|·rerank).
    * Same sampled-query-set discipline as the other recall gates.
    */
  def binaryRecallAtK(corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      rerank: Int = 20, bits: Int = 63): DataFrame =
    recallOf(Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k),
      Similarity.binaryTopK(corpus, queries, idCol, vecCol, k, rerank, bits), k)

  /** DuckDB twin of [[binaryRecallAtK]]. */
  def binaryRecallAtKSql(table: String, idCol: String, vecCol: String,
                         k: Int, queryPred: String, rerank: Int = 20,
                         bits: Int = 63): String =
    s"""WITH exact AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.bruteForceTopKSql(table, idCol, vecCol, k, queryPred)}) t),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |${Similarity.binaryTopKSql(table, idCol, vecCol, k, queryPred, rerank, bits)}) t)
       |SELECT e.q_id,
       |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  round(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
       |GROUP BY e.q_id""".stripMargin
}
