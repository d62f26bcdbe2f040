package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import PortableHash._

/** Deterministic corpus mixing: per-stratum (domain/source) sampling at
  * configured rates — the data-mixing step of a pretraining pipeline
  * (upweight curated sources, downsample crawl).
  *
  * Membership is decided by the PORTABLE hash of the row id — not
  * `rand()` — so the sample is (a) reproducible across runs and engines
  * (the DuckDB twin computes the identical predicate), (b) stable under
  * repartitioning, and (c) a pure pushdown-friendly filter: one scan,
  * zero shuffle, trivially parallel at 100 TB. Rates are in basis
  * points of the hash space (`H(id) % 10000 < rate * 10000`), so a doc
  * keeps or drops identically whether sampled alone or with its table.
  */
object Sampling {

  /** Keep rows where H(id) mod 10000 falls under the stratum's rate.
    * `rates` maps stratum value → keep fraction; `default` applies to
    * unlisted strata.
    */
  // stratum values are data, not SQL: a quote in a source name must not
  // alter (or break) the CASE expression on either engine. Escaping is
  // dialect-specific: both engines take '' for a quote, but Spark ALSO
  // interprets backslash escape sequences inside string literals ('a\b'
  // parses as a+backspace) while DuckDB keeps backslashes literal — so
  // the Spark literal doubles backslashes first, the DuckDB one must not.
  private def sparkLit(s: String): String =
    s"'${s.replace("\\", "\\\\").replace("'", "''")}'"
  private def duckLit(s: String): String = s"'${s.replace("'", "''")}'"

  def stratifiedSample(df: DataFrame, id: String, strata: String,
                       rates: Map[String, Double],
                       default: Double): DataFrame = {
    val h = s"(${sparkStringHash(s"cast($id AS STRING)")} % 10000)"
    val cases = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN ${sparkLit(s)} THEN $h < ${math.round(r * 10000)}"
    }.mkString(" ")
    df.where(expr(
      s"CASE $strata $cases ELSE $h < ${math.round(default * 10000)} END"))
  }

  /** Sequence packing: assign each doc the index of the fixed-token-
    * budget training sequence its tokens START in, under the standard
    * concat-then-chunk scheme (docs concatenated per stratum in id
    * order, split every `budget` tokens). One window cumsum per
    * stratum.
    *
    * Scale note: the window partitions by stratum — with few strata
    * that is the skew axis, so production runs partition by
    * (stratum, shard) with per-shard budgets; the per-shard job is this
    * same operator.
    */
  def packSequences(df: DataFrame, id: String, text: String,
                    strata: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strata)).orderBy(col(id))
    graft.functions.VectorFunctions.attach(df)
      .select(col(id), col(strata), expr(s"graft_token_count($text)").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id",
        expr(s"cast(floor((cum - n_tokens) / $budget.0) AS BIGINT)"))
      .select(col(id), col(strata), col("n_tokens"), col("seq_id"))
  }

  /** Sharded sequence packing — the (stratum, shard) variant
    * [[packSequences]]'s scale note promises. Each doc lands in a
    * DETERMINISTIC shard (portable hash of its id, so the assignment is
    * reproducible across runs, engines, and repartitioning), and the
    * concat-then-chunk cumsum runs per (stratum, shard) with a per-shard
    * budget. A training sequence is identified by (stratum, shard,
    * seq_id).
    *
    * Scale: this removes the one skew axis [[packSequences]] has left —
    * with few strata its window sends a stratum's whole corpus through
    * one reducer; here the window key has `shards`× the cardinality, so
    * the sort work spreads over min(strata × shards, partitions)
    * reducers. Packing quality is unchanged (each shard is a valid
    * independent packing; at most one partially-filled tail sequence per
    * shard instead of per stratum).
    */
  def packSequencesSharded(df: DataFrame, id: String, text: String,
                           strata: String, budget: Int,
                           shards: Int = 16,
                           tokensExpr: String => String =
                             t => s"graft_token_count($t)"): DataFrame = {
    require(shards >= 1, "shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val shard = s"(${sparkStringHash(s"cast($id AS STRING)")} % $shards)"
    val w = Window.partitionBy(col(strata), col("shard")).orderBy(col(id))
    graft.functions.VectorFunctions.attach(df)
      .select(col(id), col(strata), expr(shard).as("shard"),
        expr(tokensExpr(text)).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id",
        expr(s"cast(floor((cum - n_tokens) / $budget.0) AS BIGINT)"))
      .select(col(id), col(strata), col("shard"), col("n_tokens"), col("seq_id"))
  }

  def packSequencesShardedSql(table: String, id: String, text: String,
                              strata: String, budget: Int,
                              shards: Int = 16,
                              tokensExpr: String => String = t =>
                                s"len(regexp_extract_all($t, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))"): String = {
    val shard = s"(${duckStringHash(s"($id)::VARCHAR")} % $shards)"
    val ntok = tokensExpr(text)
    s"""SELECT $id, $strata, shard, n_tokens,
       |  floor((cum - n_tokens) / $budget.0)::BIGINT AS seq_id
       |FROM (
       |  SELECT $id, $strata, $shard AS shard, $ntok AS n_tokens,
       |    sum($ntok) OVER (PARTITION BY $strata, $shard ORDER BY $id) AS cum
       |  FROM $table)""".stripMargin
  }

  /** PACKING EFFICIENCY report over [[packSequencesSharded]] — the
    * report-before-acting twin of sequence packing: per stratum, how
    * many training sequences the packing produced, the integer-milli
    * mean fill against the budget, and the under/overflow counts. Fill
    * is what a training run loses to padding (underfull tails — at most
    * one per (stratum, shard) by construction) or to boundary-crossing
    * docs (a doc is assigned to the sequence where it STARTS, so a long
    * doc overflows its sequence; persistent overflow means the budget
    * is too small for the doc-length tail and chunking should run
    * first). Exact integer arithmetic; two keyed partial-agg exchanges
    * (sequence grain, then stratum grain — both metadata-sized).
    */
  def packReport(df: DataFrame, id: String, text: String,
                 strata: String, budget: Int, shards: Int = 16): DataFrame = {
    val seqs = packSequencesSharded(df, id, text, strata, budget, shards)
      .groupBy(col(strata), col("shard"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("seq_tokens"))
    seqs.groupBy(col(strata))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("seq_tokens")).as("total_tokens"),
        sum(when(col("seq_tokens") < budget, 1L).otherwise(0L)).as("n_underfull"),
        sum(when(col("seq_tokens") > budget, 1L).otherwise(0L)).as("n_overflow"))
      .withColumn("budget", lit(budget.toLong))
      .withColumn("mean_fill_milli",
        expr(s"(1000 * total_tokens) div (n_seqs * $budget)"))
  }

  /** DuckDB twin of [[packReport]]. */
  def packReportSql(table: String, id: String, text: String,
                    strata: String, budget: Int, shards: Int = 16): String =
    s"""WITH p AS (
       |${packSequencesShardedSql(table, id, text, strata, budget, shards)}),
       |seqs AS (
       |  SELECT $strata, shard, seq_id, sum(n_tokens) AS seq_tokens
       |  FROM p GROUP BY 1, 2, 3)
       |SELECT $strata, count(*)::BIGINT AS n_seqs,
       |  sum(seq_tokens)::BIGINT AS total_tokens,
       |  CAST(sum(CASE WHEN seq_tokens < $budget THEN 1 ELSE 0 END) AS BIGINT) AS n_underfull,
       |  CAST(sum(CASE WHEN seq_tokens > $budget THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
       |  $budget::BIGINT AS budget,
       |  ((1000 * sum(seq_tokens)) // (count(*) * $budget))::BIGINT AS mean_fill_milli
       |FROM seqs GROUP BY 1""".stripMargin

  def packSequencesSql(table: String, id: String, text: String,
                       strata: String, budget: Int): String =
    s"""SELECT $id, $strata, n_tokens,
       |  floor((cum - n_tokens) / $budget.0)::BIGINT AS seq_id
       |FROM (
       |  SELECT $id, $strata,
       |    len(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens,
       |    sum(len(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')))
       |      OVER (PARTITION BY $strata ORDER BY $id) AS cum
       |  FROM $table)""".stripMargin

  /** Temperature (α = 0.5) source rebalancing: per-stratum keep-rate
    * `sqrt(n_min / n_s)` — the smallest source keeps everything, larger
    * sources are downsampled so final sizes flatten toward uniform
    * (`n_s → sqrt(n_min · n_s)`, the multilingual-corpus temperature
    * trick). α = 0.5 deliberately: `sqrt` is CORRECTLY ROUNDED by IEEE
    * 754 in both engines (general `pow` is not), and the basis-point
    * cut uses exact `floor`, so membership is bit-deterministic
    * cross-engine with no round-half dependence.
    *
    * Plan: one tiny partial-agg shuffle for the per-stratum counts
    * (stratum-cardinality rows), rates broadcast back, and the corpus
    * pays one scan + hash-membership filter — the same
    * stable-under-repartitioning portable-hash membership as
    * [[stratifiedSample]]. Zero corpus shuffle.
    */
  def temperatureSample(df: DataFrame, id: String, strata: String): DataFrame = {
    val counts = df.groupBy(col(strata)).agg(count(lit(1)).as("n"))
    val nMin = counts.agg(min(col("n")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(strata),
        expr("cast(floor(sqrt(cast(n_min AS DOUBLE) / cast(n AS DOUBLE)) * 10000) AS BIGINT)")
          .as("rate_bp"))
    df.join(broadcast(rates), strata)
      .where(expr(s"(${sparkStringHash(s"cast($id AS STRING)")} % 10000) < rate_bp"))
      .select(col(id), col(strata), col("rate_bp"))
  }

  def temperatureSampleSql(table: String, id: String, strata: String): String =
    s"""WITH c AS (SELECT $strata, count(*) AS n FROM $table GROUP BY $strata),
       |m AS (SELECT min(n) AS n_min FROM c),
       |r AS (SELECT $strata,
       |        CAST(floor(sqrt(n_min::DOUBLE / n::DOUBLE) * 10000) AS BIGINT) AS rate_bp
       |      FROM c, m)
       |SELECT d.$id, d.$strata, r.rate_bp
       |FROM $table d JOIN r USING ($strata)
       |WHERE (${duckStringHash(s"(d.$id)::VARCHAR")} % 10000) < rate_bp""".stripMargin

  /** Best-k documents per stratum by a score column — corpus curation
    * under a per-source budget. Uses the bounded-heap `graft_topk`
    * aggregate: map-side partial aggregation reduces every scan task to
    * one k-item heap per stratum, so the single exchange carries
    * ≤ strata × k × partitions rows — the window formulation
    * (`row_number() OVER (PARTITION BY stratum ORDER BY score)`) would
    * shuffle and sort the entire corpus. Total order: score DESC,
    * id ASC (ties must break identically on both engines).
    */
  def selectTopKPerStratum(scored: DataFrame, id: String, strata: String,
                           scoreCol: String, k: Int): DataFrame =
    graft.functions.VectorFunctions.attach(scored)
      .groupBy(col(strata))
      .agg(expr(s"graft_topk($scoreCol, $id, $k)").as("top"))
      .select(col(strata), posexplode(col("top")))
      .select(col(strata), col("col.c_id").as(id),
        col("col.sim").as(scoreCol), (col("pos") + 1).as("rank"))

  /** Token-budget corpus selection: keep the best-scored documents
    * (score DESC, id ASC — a total order) until their RUNNING token
    * total reaches `budget` — "give me the highest-quality B tokens",
    * the curation knob that bounds a training run's data bill.
    *
    * The naive formulation is `sum(tokens) OVER (ORDER BY score DESC)`
    * — a SinglePartition window that serializes the whole corpus
    * through one task. This is the scale-correct TWO-PASS DISTRIBUTED
    * PREFIX SUM instead: range-partition by the order key (globally
    * ordered partitions), sort within partitions, then (pass 1) collect
    * the per-partition token totals — `nRanges` longs, metadata-sized —
    * and (pass 2) stream each partition adding its broadcast prefix
    * offset. One shuffle total; no single-task stage; the cutoff lands
    * exactly where the window formulation puts it (the oracle runs that
    * formulation).
    */
  def selectByTokenBudget(scored: DataFrame, id: String, scoreCol: String,
                          tokensCol: String, budget: Long,
                          nRanges: Int = 32): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // The range partition id is STAMPED INTO the rows at materialization
    // time and the eager localCheckpoint freezes it (lineage truncated —
    // no recompute can restamp). Pass 2 must NOT read
    // TaskContext.getPartitionId: a downstream coalesce (e.g. a
    // single-file write) merges many range partitions into one task,
    // where the task-level id is the COALESCED id for every one of
    // them — each range's running sum would silently restart at the
    // wrong offset.
    val sorted = scored
      .select(col(id).cast("long"), col(scoreCol).cast("double"),
        col(tokensCol).cast("long"))
      .repartitionByRange(nRanges, col(scoreCol).desc, col(id).asc)
      .sortWithinPartitions(col(scoreCol).desc, col(id).asc)
      .as[(Long, Double, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map { case (i, sc, tk) => (i, sc, tk, pid) }
      }
      .toDF(id, scoreCol, "n_tokens", "pid")
      .localCheckpoint(true)
    // pass 1: per-range token totals — ≤ nRanges rows, metadata-sized
    val totals = sorted.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix: offset for pid = sum of totals of ranges < pid
    val prefix = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val bc = spark.sparkContext.broadcast(prefix)
    // pass 2: stream each range adding its broadcast offset; rows of one
    // pid are contiguous and sorted (they live in one stored partition;
    // coalesce concatenates whole partitions), so a pid transition
    // re-bases the running sum
    sorted.as[(Long, Double, Long, Int)].mapPartitions { it =>
      var cur = -1
      var run = 0L
      it.flatMap { case (i, sc, tk, pid) =>
        if (pid != cur) { cur = pid; run = bc.value.getOrElse(pid, 0L) }
        run += tk
        if (run <= budget) Some((i, sc, tk, run)) else None
      }
    }.toDF(id, scoreCol, "n_tokens", "cum_tokens")
  }

  /** DuckDB twin of [[selectByTokenBudget]] — the window formulation
    * the distributed prefix sum must reproduce exactly.
    */
  def selectByTokenBudgetSql(table: String, id: String, scoreExpr: String,
                             tokensExpr: String, budget: Long): String =
    s"""SELECT $id, score, n_tokens, cum_tokens FROM (
       |  SELECT $id, score, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, $id ASC
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM (SELECT $id, $scoreExpr AS score, ($tokensExpr)::BIGINT AS n_tokens
       |        FROM $table) s) t
       |WHERE cum_tokens <= $budget""".stripMargin

  /** PER-STRATUM token budgets — the data-MIXING form of
    * [[selectByTokenBudget]]: each stratum (source/domain/language) gets
    * its own token allocation, filled best-score-first within the
    * stratum. This is how a real pretraining mix is assembled (fixed
    * token counts per domain), not one global budget.
    *
    * Same two-pass distributed prefix sum, generalized to a keyed one:
    * range-partition on (stratum, score desc, id) — each stratum spans a
    * CONTIGUOUS run of ranges, so (pass 1) the collected per-(range,
    * stratum) totals (≤ nRanges + #strata rows, metadata-sized) give an
    * exclusive per-stratum offset for every range, and (pass 2) each
    * partition streams, re-basing its running sum at every (range,
    * stratum) transition. One shuffle, no SinglePartition window, and —
    * unlike a `sum over (partition by stratum)` window — no stratum ever
    * funnels through a single reducer: a hot stratum spreads over as
    * many ranges as its row share demands.
    */
  def selectByTokenBudgetStratified(scored: DataFrame, id: String,
                                    strataCol: String, scoreCol: String,
                                    tokensCol: String,
                                    budgets: Map[String, Long],
                                    defaultBudget: Long,
                                    nRanges: Int = 32): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val sorted = scored
      .select(col(strataCol).cast("string"), col(id).cast("long"),
        col(scoreCol).cast("double"), col(tokensCol).cast("long"))
      .repartitionByRange(nRanges, col(strataCol).asc, col(scoreCol).desc, col(id).asc)
      .sortWithinPartitions(col(strataCol).asc, col(scoreCol).desc, col(id).asc)
      .as[(String, Long, Double, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map { case (st, i, sc, tk) => (st, i, sc, tk, pid) }
      }
      .toDF(strataCol, id, scoreCol, "n_tokens", "pid")
      .localCheckpoint(true) // stamp + freeze pids (see selectByTokenBudget)
    // pass 1: per-(range, stratum) totals — metadata-sized
    val totals = sorted.groupBy(col("pid"), col(strataCol))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val prefix: Map[(Int, String), Long] = totals.groupBy(_._2).flatMap {
      case (st, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pid, off) => (pid, st) -> off }
    }
    val bcPrefix = spark.sparkContext.broadcast(prefix)
    val bcBudgets = spark.sparkContext.broadcast(budgets)
    // pass 2: rows of one (pid, stratum) are contiguous and sorted; every
    // transition re-bases the running sum from the broadcast offsets
    sorted.as[(String, Long, Double, Long, Int)].mapPartitions { it =>
      var curSt: String = null
      var curPid = -1
      var run = 0L
      it.flatMap { case (st, i, sc, tk, pid) =>
        if (pid != curPid || st != curSt) {
          curPid = pid; curSt = st
          run = bcPrefix.value.getOrElse((pid, st), 0L)
        }
        run += tk
        if (run <= bcBudgets.value.getOrElse(st, defaultBudget)) {
          Some((st, i, sc, tk, run))
        } else None
      }
    }.toDF(strataCol, id, scoreCol, "n_tokens", "cum_tokens")
  }

  /** DuckDB twin of [[selectByTokenBudgetStratified]] — the keyed-window
    * formulation the distributed keyed prefix sum must reproduce.
    */
  def selectByTokenBudgetStratifiedSql(table: String, id: String,
                                       strataCol: String, scoreExpr: String,
                                       tokensExpr: String,
                                       budgets: Map[String, Long],
                                       defaultBudget: Long): String = {
    val cases = budgets.toSeq.sortBy(_._1)
      .map { case (st, b) => s"WHEN '$st' THEN $b" }.mkString(" ")
    s"""SELECT $strataCol, $id, score, n_tokens, cum_tokens FROM (
       |  SELECT $strataCol, $id, score, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY $strataCol
       |                             ORDER BY score DESC, $id ASC
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM (SELECT $strataCol, $id, $scoreExpr AS score,
       |               ($tokensExpr)::BIGINT AS n_tokens
       |        FROM $table) s) t
       |WHERE cum_tokens <= CASE $strataCol $cases ELSE $defaultBudget END""".stripMargin
  }

  /** MIX FILL REPORT over [[selectByTokenBudgetStratified]] — the
    * report-before-acting twin of the data-mixing budget (the census /
    * corpus-profile / quality-report pattern): per stratum, what was
    * OFFERED (docs and tokens available), what the budget TOOK, the
    * requested allocation, and the integer-milli fill rate. This is the
    * table a run publishes to show which strata are supply-limited
    * (fill < 1000 means the stratum ran out of docs before its budget)
    * vs budget-limited — the decision input for re-balancing the mix.
    *
    * Scale shape: the scored frame is leased so the offered-side agg and
    * the selection share one derivation; both aggregations are keyed
    * partial-agg exchanges of stratum rows (metadata-sized outputs).
    */
  def budgetFillReport(scored: DataFrame, id: String, strataCol: String,
                       scoreCol: String, tokensCol: String,
                       budgets: Map[String, Long], defaultBudget: Long,
                       nRanges: Int = 32): DataFrame = {
    val leased = Caches.lease(scored)
    val offered = leased
      .groupBy(col(strataCol).cast("string").as(strataCol))
      .agg(count(lit(1)).as("n_offered"),
        sum(col(tokensCol).cast("long")).as("tokens_offered"))
    val taken = selectByTokenBudgetStratified(leased, id, strataCol, scoreCol,
        tokensCol, budgets, defaultBudget, nRanges)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBudget)) { case ((st, b), acc) =>
        when(col(strataCol) === st, lit(b)).otherwise(acc)
      }
    // left join keeps strata whose budget took nothing (or that offered
    // docs none of which fit) in the report
    offered.join(taken, Seq(strataCol), "left_outer")
      .select(col(strataCol), col("n_offered"), col("tokens_offered"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        budgetCol.as("budget"))
      .withColumn("fill_milli", expr("(1000 * tokens_kept) div budget"))
  }

  /** DuckDB twin of [[budgetFillReport]]. */
  def budgetFillReportSql(table: String, id: String, strataCol: String,
                          scoreExpr: String, tokensExpr: String,
                          budgets: Map[String, Long],
                          defaultBudget: Long): String = {
    val cases = budgets.toSeq.sortBy(_._1)
      .map { case (st, b) => s"WHEN '$st' THEN $b" }.mkString(" ")
    s"""WITH sel AS (
       |${selectByTokenBudgetStratifiedSql(table, id, strataCol, scoreExpr,
            tokensExpr, budgets, defaultBudget)}),
       |off AS (SELECT $strataCol, count(*)::BIGINT AS n_offered,
       |               sum(($tokensExpr)::BIGINT)::BIGINT AS tokens_offered
       |        FROM $table GROUP BY 1),
       |tk AS (SELECT $strataCol, count(*)::BIGINT AS n_kept,
       |              sum(n_tokens)::BIGINT AS tokens_kept
       |       FROM sel GROUP BY 1)
       |SELECT o.$strataCol, o.n_offered, o.tokens_offered,
       |  coalesce(tk.n_kept, 0)::BIGINT AS n_kept,
       |  coalesce(tk.tokens_kept, 0)::BIGINT AS tokens_kept,
       |  (CASE o.$strataCol $cases ELSE $defaultBudget END)::BIGINT AS budget,
       |  ((1000 * coalesce(tk.tokens_kept, 0)) //
       |   CASE o.$strataCol $cases ELSE $defaultBudget END)::BIGINT AS fill_milli
       |FROM off o LEFT JOIN tk ON o.$strataCol = tk.$strataCol""".stripMargin
  }

  def stratifiedSampleSql(table: String, id: String, strata: String,
                          rates: Map[String, Double],
                          default: Double): String = {
    val h = s"(${duckStringHash(s"($id)::VARCHAR")} % 10000)"
    val cases = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN ${duckLit(s)} THEN $h < ${math.round(r * 10000)}"
    }.mkString(" ")
    s"""SELECT * FROM $table
       |WHERE CASE $strata $cases ELSE $h < ${math.round(default * 10000)} END""".stripMargin
  }

  /** Deterministic train/val/test assignment: H(id) mod 100 partitions
    * the hash space into [0, valBp) → "val", [valBp, valBp+testBp) →
    * "test", rest → "train" (basis points of 100). The same properties
    * as [[stratifiedSample]]: reproducible across runs/engines, stable
    * under repartitioning, zero shuffle — and a doc NEVER migrates
    * between splits when the corpus grows, because membership depends
    * only on its own id (the leakage guarantee a random split lacks).
    */
  /** Deterministic round-robin source interleave — the TRAINING-ORDER
    * op for a mixed corpus (a run that reads source A's docs then
    * source B's collapses its early batches onto one distribution;
    * interleaving fixes the mixing rate and hash-determinism makes the
    * order reproducible run-to-run): docs rank within their source by
    * (portable hash of id, id), and the global position is pure
    * ARITHMETIC — `pos = rank·S + source_index` — so no global sort
    * ever runs. The within-source rank itself is TWO-PASS (the
    * [[selectByTokenBudget]] discipline): local ranks within
    * (source, shard) — parallelism S·nShards, so a 5-source 100 TB
    * corpus never funnels a whole source through one reducer — then
    * exclusive shard-prefix offsets from an (S × nShards)-row metadata
    * frame broadcast back. Consumers `ORDER BY pos`
    * per shard, or range-partition on pos for the packed write.
    * Positions are gap-free per round until a source exhausts, then
    * that source's slots go unused — the standard round-robin
    * semantics (exhausted-source slots are NOT recycled, keeping every
    * doc's position independent of other sources' sizes).
    */
  def interleave(df: DataFrame, id: String, source: String,
                 nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = sparkStringHash(s"cast($id AS STRING)")
    val h2 = universal(1, h)
    // within-source rank in TWO passes so no reducer ever sees a whole
    // source (the selectByTokenBudget/shardedShuffle discipline): local
    // rank within (source, shard), then exclusive shard-prefix offsets
    // — an (S × nShards)-row metadata frame — broadcast back
    val w = Window.partitionBy(col(source), col("__shard"))
      .orderBy(col("__h2"), col(id))
    val ranked = Caches.lease(df.select(col(id), col(source))
      .withColumn("__shard", expr(s"$h % $nShards"))
      .withColumn("__h2", expr(h2))
      .withColumn("__lr", row_number().over(w).cast("long") - 1))
    val offW = Window.partitionBy(col(source)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranked.groupBy(col(source), col("__shard"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select(col(source), col("__shard"), col("__off"))
    // source index derived from the OFFSETS metadata frame (itself off
    // the leased ranked rows) — never a second scan of the input
    val srcIdx = offsets.select(col(source)).distinct()
      .withColumn("__sidx",
        row_number().over(Window.orderBy(col(source))).cast("long") - 1)
    val nSrc = srcIdx.agg(count(lit(1)).as("__ns"))
    ranked.join(broadcast(offsets), Seq(source, "__shard"))
      .join(broadcast(srcIdx), Seq(source))
      .crossJoin(broadcast(nSrc))
      .select(col(id), col(source),
        ((col("__off") + col("__lr")) * col("__ns") + col("__sidx")).as("pos"))
  }

  /** DuckDB twin of [[interleave]]. */
  def interleaveSql(table: String, id: String, source: String,
                    nShards: Int = 16): String = {
    val h = duckStringHash(s"($id)::VARCHAR")
    val h2 = universal(1, h)
    s"""WITH base AS (
       |  SELECT $id, $source, ($h % $nShards) AS shard, $h2 AS h2 FROM $table),
       |ranked AS (
       |  SELECT $id, $source, shard,
       |    (row_number() OVER (PARTITION BY $source, shard
       |       ORDER BY h2, $id) - 1)::BIGINT AS lr
       |  FROM base),
       |cnts AS (SELECT $source, shard, count(*)::BIGINT AS c
       |         FROM ranked GROUP BY 1, 2),
       |offs AS (
       |  SELECT $source, shard,
       |    coalesce(sum(c) OVER (PARTITION BY $source ORDER BY shard
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
       |  FROM cnts),
       |sidx AS (
       |  SELECT $source, (row_number() OVER (ORDER BY $source) - 1)::BIGINT AS si
       |  FROM (SELECT DISTINCT $source FROM $table)),
       |ns AS (SELECT count(*)::BIGINT AS n FROM sidx)
       |SELECT r.$id, r.$source, ((o.off + r.lr) * ns.n + s.si)::BIGINT AS pos
       |FROM ranked r
       |JOIN offs o ON r.$source = o.$source AND r.shard = o.shard
       |JOIN sidx s ON r.$source = s.$source, ns""".stripMargin
  }

  def splitAssign(df: DataFrame, id: String,
                  valPct: Int = 1, testPct: Int = 1): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val h = s"(${sparkStringHash(s"cast($id AS STRING)")} % 100)"
    df.withColumn("split", expr(
      s"CASE WHEN $h < $valPct THEN 'val' " +
        s"WHEN $h < ${valPct + testPct} THEN 'test' ELSE 'train' END"))
  }

  /** DuckDB twin of [[splitAssign]] (emits id + split). */
  def splitAssignSql(table: String, id: String,
                     valPct: Int = 1, testPct: Int = 1): String = {
    val h = s"(${duckStringHash(s"($id)::VARCHAR")} % 100)"
    s"""SELECT *, CASE WHEN $h < $valPct THEN 'val'
       |  WHEN $h < ${valPct + testPct} THEN 'test' ELSE 'train' END AS split
       |FROM $table""".stripMargin
  }

  /** Leakage-safe split: assignment hashes a GROUP key instead of the
    * doc's own id, so correlated documents — near-duplicate components,
    * same-origin pages, chunk siblings — can never straddle
    * train/val/test (the eval-leakage mode a plain per-doc hash split
    * invites: the val copy of a near-dup pair scores what train
    * memorized). `groups` maps id → group (e.g.
    * [[graft.ops.Dedup.minhashDedupComponents]] output); ungrouped docs
    * coalesce to their own id, which makes their assignment IDENTICAL
    * to [[splitAssign]] — adding the guard never reshuffles singleton
    * docs. One broadcast-or-keyed left join + a projection; the split
    * stays stable as the corpus grows (hash-range membership).
    */
  def splitAssignGrouped(df: DataFrame, id: String, groups: DataFrame,
                         gid: String, ggroup: String,
                         valPct: Int = 1, testPct: Int = 1): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val g = groups.select(col(gid).as(id), col(ggroup).as("__g"))
    val h = s"(${sparkStringHash(s"cast(coalesce(__g, $id) AS STRING)")} % 100)"
    df.join(g, Seq(id), "left")
      .withColumn("split", expr(
        s"CASE WHEN $h < $valPct THEN 'val' " +
          s"WHEN $h < ${valPct + testPct} THEN 'test' ELSE 'train' END"))
      .drop("__g")
  }

  /** DuckDB twin of [[splitAssignGrouped]]: `groupsSql` emits
    * (doc_id, component_id) — e.g. [[graft.ops.Dedup.minhashDedupComponentsSql]].
    */
  def splitAssignGroupedSql(table: String, id: String, groupsSql: String,
                            valPct: Int = 1, testPct: Int = 1): String = {
    val h = s"(${duckStringHash(s"coalesce(c.component_id, d.$id)::VARCHAR")} % 100)"
    s"""SELECT d.*, CASE WHEN $h < $valPct THEN 'val'
       |  WHEN $h < ${valPct + testPct} THEN 'test' ELSE 'train' END AS split
       |FROM $table d LEFT JOIN ($groupsSql) c ON d.$id = c.doc_id""".stripMargin
  }

  /** Deterministic sharded corpus shuffle: shard = H(id) mod `nShards`,
    * rank = position in the shard's (H2(id), id) order — the stable
    * "shuffle once" a training run needs (epoch order must be
    * reproducible and decoupled from storage order). Global order is
    * (shard, rank). Sharding first keeps the sort parallel: each
    * reducer sorts ONE shard's rows (a window per shard), instead of
    * the single-partition global `row_number` that serializes the
    * corpus through one task. H2 (a different universal-hash lane than
    * the shard hash) decorrelates within-shard order from shard
    * assignment.
    */
  def shardedShuffle(df: DataFrame, id: String, nShards: Int = 64): DataFrame = {
    require(nShards > 0)
    val h = sparkStringHash(s"cast($id AS STRING)")
    val h2 = universal(1, h)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("__h2"), col(id))
    df.withColumn("shard", expr(s"$h % $nShards"))
      .withColumn("__h2", expr(h2))
      .withColumn("rank", row_number().over(w))
      .drop("__h2")
  }

  /** DuckDB twin of [[shardedShuffle]] (emits id + shard + rank). */
  def shardedShuffleSql(table: String, id: String, nShards: Int = 64): String = {
    val h = duckStringHash(s"($id)::VARCHAR")
    val h2 = universal(1, h)
    s"""SELECT *, ($h % $nShards) AS shard,
       |  row_number() OVER (PARTITION BY ($h % $nShards)
       |    ORDER BY $h2, $id) AS rank
       |FROM $table""".stripMargin
  }

  /** Percentile-BAND filter (winsorized selection): keep the documents
    * whose `valueCol` lies inside the per-group [p(lo), p(hi)] band —
    * the curation move that drops both distribution tails (truncated /
    * boilerplate-short docs AND concatenation-artifact giants) with
    * thresholds that ADAPT per group instead of one global constant
    * (a 5th-percentile length in one language is a 50th in another).
    *
    * Exact rank-selection percentiles ([[Stats.percentilesDiscPreagg]]
    * — the pre-aggregated scale formulation: per-group sorts run over
    * DISTINCT values, the duplication-heavy case value columns are);
    * the groups×2 band table broadcasts back onto a second corpus scan,
    * so the filter itself is shuffle-free.
    */
  def qualityBand(df: DataFrame, id: String, groupCol: String,
                  valueCol: String, pLo: Double = 0.1,
                  pHi: Double = 0.9): DataFrame = {
    val lo = s"p${math.round(pLo * 100)}"
    val hi = s"p${math.round(pHi * 100)}"
    val bands = Stats.percentilesDiscPreagg(df, groupCol, valueCol, Seq(pLo, pHi))
      .select(col(groupCol), col(lo), col(hi))
    df.select(col(id), col(groupCol), col(valueCol))
      .join(org.apache.spark.sql.functions.broadcast(bands), Seq(groupCol))
      .where(col(valueCol) >= col(lo) && col(valueCol) <= col(hi))
      .select(col(id), col(groupCol), col(valueCol), col(lo), col(hi))
  }

  /** [[qualityBand]] keeping ALL of the document's columns (the
    * composition form — downstream stages need the text): same
    * broadcast band table, same shuffle-free filter, no projection.
    */
  def qualityBandAll(df: DataFrame, groupCol: String, valueCol: String,
                     pLo: Double = 0.1, pHi: Double = 0.9): DataFrame = {
    val lo = s"p${math.round(pLo * 100)}"
    val hi = s"p${math.round(pHi * 100)}"
    val bands = Stats.percentilesDiscPreagg(df, groupCol, valueCol, Seq(pLo, pHi))
      .select(col(groupCol), col(lo), col(hi))
    df.join(org.apache.spark.sql.functions.broadcast(bands), Seq(groupCol))
      .where(col(valueCol) >= col(lo) && col(valueCol) <= col(hi))
      .drop(lo, hi)
  }

  /** Derived-table SQL of [[qualityBandAll]] (all base columns, band
    * bounds dropped) — slots into any downstream twin's table slot. */
  def qualityBandAllSql(table: String, groupCol: String, valueCol: String,
                        tieCol: String, pLo: Double = 0.1,
                        pHi: Double = 0.9): String = {
    val lo = s"p${math.round(pLo * 100)}"
    val hi = s"p${math.round(pHi * 100)}"
    s"""(SELECT t.* FROM $table t JOIN (
       |${Stats.percentilesDiscSql(table, groupCol, valueCol, tieCol, Seq(pLo, pHi))}) b
       |ON t.$groupCol = b.$groupCol
       |WHERE t.$valueCol >= b.$lo AND t.$valueCol <= b.$hi)""".stripMargin
  }

  /** DuckDB twin of [[qualityBand]] (row-sort percentile formulation —
    * identical rank selection, see [[Stats.percentilesDiscPreagg]]). */
  def qualityBandSql(table: String, id: String, groupCol: String,
                     valueCol: String, tieCol: String, pLo: Double = 0.1,
                     pHi: Double = 0.9): String = {
    val lo = s"p${math.round(pLo * 100)}"
    val hi = s"p${math.round(pHi * 100)}"
    s"""WITH bands AS (
       |${Stats.percentilesDiscSql(table, groupCol, valueCol, tieCol, Seq(pLo, pHi))})
       |SELECT t.$id, t.$groupCol, t.$valueCol, b.$lo, b.$hi
       |FROM $table t JOIN bands b ON t.$groupCol = b.$groupCol
       |WHERE t.$valueCol >= b.$lo AND t.$valueCol <= b.$hi""".stripMargin
  }

  /** BEST-OF-N selection (round 19) — the rejection-sampling /
    * BoN-distillation prep every RM-scored sampling loop runs: per
    * prompt, pick the highest-scored sample (the SFT target or the
    * DPO "chosen") and the lowest (the DPO "rejected"), with the
    * candidate count and the signed score margin (a DIFFERENCE, never
    * a division). Selection is a lexicographic struct max/min —
    * identical semantics on both engines — so ties are
    * arbitrary-but-DETERMINISTIC (the min(verdict) convention): equal
    * scores break toward the GREATER sample id for best and the LOWER
    * id for worst (pure struct ordering, no negation — negating an id
    * for a min-tie-break would overflow on Long.MinValue). NULL
    * scores AND NULL sample ids are out of domain on both dialects
    * (an unscored sample cannot be compared, and a NULL id inside the
    * tie-break struct would order NULLS-FIRST on Spark but NULLS-LAST
    * on DuckDB — the round-19 NULL-sort-field divergence class).
    * A single-candidate prompt selects itself on both sides with
    * margin 0.
    *
    * Plan shape: ONE prompt-keyed partial-agg exchange — the struct
    * max/min combine map-side, so the shuffle carries |prompts| rows
    * of two (score, id) structs, never the sample table. Distributive
    * (the complete-mode streaming family).
    */
  def bonSelect(df: DataFrame, prompt: String, sample: String,
                score: String): DataFrame =
    df.where(col(score).isNotNull && col(sample).isNotNull)
      .select(col(prompt).as("prompt_id"),
        struct(col(score).cast("long").as("s"),
          col(sample).cast("long").as("i")).as("__x"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_candidates"),
        max(col("__x")).as("__b"), min(col("__x")).as("__w"))
      .select(col("prompt_id"), col("n_candidates"),
        col("__b.i").as("best_id"), col("__b.s").as("best_score_milli"),
        col("__w.i").as("worst_id"), col("__w.s").as("worst_score_milli"),
        (col("__b.s") - col("__w.s")).as("margin_milli"))

  /** DuckDB twin of [[bonSelect]] (struct_pack max/min — probed
    * lexicographic, same tie-break; trunc-routed casts).
    */
  def bonSelectSql(table: String, prompt: String, sample: String,
                   score: String): String =
    s"""SELECT prompt_id, count(*) AS n_candidates,
       |  (max(x)).i AS best_id, (max(x)).s AS best_score_milli,
       |  (min(x)).i AS worst_id, (min(x)).s AS worst_score_milli,
       |  ((max(x)).s - (min(x)).s)::BIGINT AS margin_milli
       |FROM (
       |  SELECT $prompt AS prompt_id,
       |    struct_pack(s := ${graft.ops.PortableHash.truncToZero(s"$score")},
       |      i := ${graft.ops.PortableHash.truncToZero(s"$sample")}) AS x
       |  FROM $table WHERE $score IS NOT NULL AND $sample IS NOT NULL)
       |GROUP BY prompt_id""".stripMargin
}

