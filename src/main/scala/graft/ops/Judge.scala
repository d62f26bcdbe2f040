package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-judgment analytics (round 17) — the evaluation side of a
  * preference pipeline: rows are head-to-head model comparisons
  * `(prompt_id, model_a, model_b, winner)` (the public
  * LLM-arena/LLM-judge interchange shape), and the pipeline needs the
  * win-rate matrix and a single strength score per model before any
  * preference data is trusted.
  *
  * Both ops aggregate the match table ONCE into unordered-pair grain
  * (one partial-aggregated exchange of (model, model) key rows — at
  * 100 TB of judgments the pair table is |models|² rows, metadata-
  * sized, and everything after it is driver-scale) and stay EXACT:
  * win rates in integer MILLI, Bradley-Terry scores via the
  * minorization-maximization recurrence in integer-milli arithmetic
  * with a FIXED iteration count — integer sums are order-independent
  * and both engines' integer division agrees on non-negatives, so the
  * DuckDB twin replays the computation bit-identically (the float MM
  * would hash-diverge: cross-partition float sum order is not
  * deterministic). Ties: any winner that is not exactly one of the
  * two models — NULL, a 'tie'-style string (how public arena dumps
  * encode draws), or a typo'd name — counts as half a win for each
  * side, in HALF-win units internally (integers stay exact), halves
  * only surfacing in the milli outputs.
  *
  * Why Bradley-Terry and not Elo: Elo's sequential update makes the
  * result depend on MATCH ORDER — on a distributed table with no
  * inherent order that is nondeterministic by construction (and
  * imposing an order serializes the computation through one
  * partition). BT's MM estimator consumes only the order-independent
  * pair-grain sufficient statistics the [[pairAgg]] exchange already
  * produces — the public arena analyses made the same switch for the
  * same reason.
  *
  * Streaming stance (round 18, pinned in StreamingOpsSpec): [[winRate]]
  * and [[positionBias]] are distributive pair/model-grain aggs and
  * maintain themselves incrementally in complete mode — the live arena
  * leaderboard. [[btScores]] is BATCH-ONLY by design: its
  * fixed-iteration MM re-joins the aggregated pair table, which
  * complete mode cannot express — run it over the maintained pair
  * table at read time.
  */
object Judge {

  /** Canonical unordered-pair aggregate: one row per (lo, hi) model
    * pair with match counts and lo's wins in half-win units.
    */
  private def pairAgg(df: DataFrame, a: String, b: String,
                      winner: String): DataFrame =
    df.where(col(a) =!= col(b))
      .select(least(col(a), col(b)).as("lo"),
        greatest(col(a), col(b)).as("hi"),
        // lo's half-wins in this match: 2 for a win, 0 for a loss, 1
        // for ANYTHING else — NULL, but also 'tie'/'tie (bothbad)'
        // strings (how public arena dumps encode draws) and typo'd
        // model names. Crediting only exact matches and tying the rest
        // keeps an unmatched winner from silently counting as a win
        // for whichever model sorts greater.
        when(col(winner) === least(col(a), col(b)), lit(2L))
          .when(col(winner) === greatest(col(a), col(b)), lit(0L))
          .otherwise(lit(1L)).as("hw"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_matches"), sum(col("hw")).as("lo_halfwins"))

  /** Win-rate MATRIX at unordered-pair grain: matches, lo-side wins in
    * milli (ties = half). Self-matches are out of domain (dropped —
    * a model cannot beat itself); the milli is integer division over
    * half-win units, exact on both engines.
    */
  def winRate(df: DataFrame, a: String, b: String,
              winner: String): DataFrame =
    pairAgg(df, a, b, winner)
      .select(col("lo").as("model_lo"), col("hi").as("model_hi"),
        col("n_matches"),
        expr("cast(lo_halfwins * 1000 div (n_matches * 2) AS BIGINT)")
          .as("lo_winrate_milli"))

  /** DuckDB twin of [[winRate]]. */
  def winRateSql(table: String, a: String, b: String,
                 winner: String): String =
    s"""SELECT lo AS model_lo, hi AS model_hi,
       |  count(*) AS n_matches,
       |  (sum(hw) * 1000 // (count(*) * 2))::BIGINT AS lo_winrate_milli
       |FROM (
       |  SELECT least($a, $b) AS lo, greatest($a, $b) AS hi,
       |    CASE WHEN $winner = least($a, $b) THEN 2
       |         WHEN $winner = greatest($a, $b) THEN 0 ELSE 1 END AS hw
       |  FROM $table WHERE $a <> $b)
       |GROUP BY lo, hi""".stripMargin

  /** Bradley-Terry strength scores by fixed-iteration MM, integer
    * milli — `iters` fixed (not run-to-convergence) so the oracle can
    * mirror the exact computation, the [[Dedup.minhashDedupComponents]]
    * convention. The MM update
    * `w_i ← W_i / Σ_j n_ij / (w_i + w_j)` runs in scaled integers:
    * `term_ij = n_ij·2·10⁹ div (w_i + w_j)` (half-win match units ×
    * 10⁹ over milli strengths), `w_i' = W_i·10⁹ div Σ_j term_ij` —
    * every sum is an integer sum (order-independent) and every
    * division non-negative, so Spark `div` ≡ DuckDB `//`. Strengths
    * start at 1000 milli; three iterations move a 2:1 favorite to
    * within ~2% of the float MM fixed point (spec-pinned), and values
    * stay far from the 64-bit edge (w ≤ 10⁶ milli for any n ≤ 10⁹).
    * Models with zero wins (W_i = 0) land at 0 — the MM fixed point's
    * boundary, reached in one step.
    *
    * Plan shape (r20): ONE keyed exchange builds the directed pair
    * table (pair grain, metadata-sized — broadcast-sized at any corpus
    * scale, the judgment TABLE is never re-scanned), which is COLLECTED
    * and the MM ladder runs on the driver ([[btLadderLocal]]); the
    * result frame is a LocalTableScan. As Spark iterations the ladder
    * was ~10 stage launches over |models|-sized frames — pure
    * scheduling latency (judge_bt_convergence 4.4s at sf0.1).
    */
  /** The MM ladder, run on the DRIVER over the collected pair table
    * (r20 optimization). The pair table is |models|²-bounded metadata
    * by design ("broadcast-sized at any corpus scale" — the judgment
    * TABLE is never re-scanned), which is exactly the class the engine
    * already collects driver-side (the PqIndex/Dsir/Bpe
    * centroid/vocab-bounded precedent): as a Spark iteration, each MM
    * step was 2 joins + a re-aggregate over a tiny frame, so a
    * 3-iteration ladder paid ~10 stage launches of pure scheduling
    * latency — judge_bt_convergence read 4.4s at sf0.1 with every
    * frame past the lease |models|-sized. Collected, the ladder is
    * zero jobs; only the pairAgg scan remains distributed. A
    * pathological model universe fails LOUD at
    * spark.driver.maxResultSize, not silently.
    *
    * Arithmetic is bit-identical to the Spark form (and the DuckDB
    * twin): every sum is an integer sum over Longs (order-independent),
    * every division non-negative, so Scala `/` ≡ Spark `div` ≡ DuckDB
    * `//` — and every product/sum that could cross 2^63 at corpus
    * scale rides `Math.multiplyExact`/`addExact` (r21), preserving the
    * ANSI-mode fail-loud contract the old Spark form had. Returns
    * (models in directed order, hw_total, final w, previous-iteration
    * w) plus the model column's type.
    */
  /** @return (models in first-seen pair order, w at iteration
    *         `iters - 1`, w at iteration `iters`, model column type) */
  private def btLadderLocal(df: DataFrame, a: String, b: String,
                            winner: String, iters: Int):
      (Seq[Any], collection.Map[Any, Long], collection.Map[Any, Long],
       org.apache.spark.sql.types.DataType) = {
    val pa = pairAgg(df, a, b, winner)
    val mType = pa.schema("lo").dataType
    val adj = scala.collection.mutable.LinkedHashMap
      .empty[Any, scala.collection.mutable.ArrayBuffer[(Any, Long, Long)]]
    pa.collect().foreach { r =>
      val lo = r.get(0); val hi = r.get(1)
      val n = r.getLong(2); val loHw = r.getLong(3)
      adj.getOrElseUpdate(lo,
        scala.collection.mutable.ArrayBuffer.empty) += ((hi, n, loHw))
      adj.getOrElseUpdate(hi,
        scala.collection.mutable.ArrayBuffer.empty) += ((lo, n, Math.subtractExact(Math.multiplyExact(n, 2L), loHw)))
    }
    // exact arithmetic throughout the ladder (r21): the old ANSI-mode
    // Spark form failed loud on overflow; Scala Long `*`/`+` wrap
    // silently — at 100 TB (n_matches·2e9, halfwin totals·1e9 cross
    // 2^63 around ~4.6e9 matches per pair / ~9.2e9 halfwins per model)
    // a wrapped weight would be a silently-garbage ranking
    val hwTotal = adj.map { case (m, es) =>
      m -> es.iterator.map(_._3).foldLeft(0L)(Math.addExact) }
    // start: every model at 1000 milli; one MM step:
    // term = n·2·1e9 div (w_m + w_opp) — n_matches in whole matches,
    // halfwin totals in halves, the 2× keeps the units aligned —
    // then w' = W_i·1e9 div Σ term
    var w: collection.Map[Any, Long] = adj.map { case (m, _) => m -> 1000L }
    var prev = w
    for (_ <- 1 to iters) {
      prev = w
      val cur = w
      w = adj.map { case (m, es) =>
        val wm = cur(m)
        var denom = 0L
        es.foreach { case (opp, n, _) =>
          denom = Math.addExact(denom,
            Math.multiplyExact(n, 2000000000L) / math.max(Math.addExact(wm, cur(opp)), 1L))
        }
        m -> Math.multiplyExact(hwTotal(m), 1000000000L) / math.max(denom, 1L)
      }
    }
    (adj.keys.toSeq, prev, w, mType)
  }

  private def btFrame(spark: org.apache.spark.sql.SparkSession,
                      mType: org.apache.spark.sql.types.DataType,
                      cols: Seq[(String, org.apache.spark.sql.types.DataType)],
                      rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val schema = StructType(StructField("model", mType) +:
      cols.map { case (n, t) => StructField(n, t) })
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  def btScores(df: DataFrame, a: String, b: String,
               winner: String, iters: Int = 3): DataFrame = {
    val (models, _, w, mType) = btLadderLocal(df, a, b, winner, iters)
    import org.apache.spark.sql.types.LongType
    btFrame(df.sparkSession, mType, Seq("bt_milli" -> LongType),
      models.map(m => org.apache.spark.sql.Row(m, w(m))))
  }

  /** CONVERGENCE report over the [[btScores]] iteration ladder — the
    * diagnostic a consumer needs to tell a SETTLED ranking from a
    * TRUNCATED one (the MM runs a fixed `iters`, not to convergence,
    * so the oracle can mirror it): per model, the final strength plus
    * the last iteration's SIGNED milli movement
    * `delta_milli = w_iters − w_{iters−1}` and its magnitude. A board
    * whose max `abs_delta_milli` is single-digit milli has settled;
    * large deltas mean the published bt_milli is still moving and
    * needs more iterations. The delta is a pure DIFFERENCE (never a
    * signed division, the repo rule); JudgeSpec pins the magnitudes
    * shrinking as planted iteration counts grow.
    *
    * Plan shape: [[btScores]]' shape plus ONE more |models|-row join —
    * the directed pair table is leased once and every frame past it is
    * metadata-sized.
    */
  def btConvergence(df: DataFrame, a: String, b: String,
                    winner: String, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"btConvergence needs iters >= 1, got $iters")
    val (models, prev, w, mType) = btLadderLocal(df, a, b, winner, iters)
    import org.apache.spark.sql.types.LongType
    btFrame(df.sparkSession, mType,
      Seq("bt_milli" -> LongType, "delta_milli" -> LongType,
        "abs_delta_milli" -> LongType),
      models.map { m =>
        val d = w(m) - prev(m)
        org.apache.spark.sql.Row(m, w(m), d, math.abs(d))
      })
  }

  /** POSITION-BIAS report (round 18) — the order-effect audit an arena
    * analysis runs before trusting any win rate or BT score: pairwise
    * LLM judgments are known to favor the response shown FIRST, and
    * `(model_a, model_b)` carries presentation order (which [[winRate]]
    * deliberately erases at unordered-pair grain). Per model: matches
    * and win rate in milli as model_a (shown first) vs as model_b
    * (shown second), plus the signed milli gap — a healthy corpus has
    * gaps near zero; a uniformly positive column means the judge
    * rewards position, not quality.
    *
    * Scoring matches [[pairAgg]]: half-win units, any winner that is
    * not exactly one of the two models counts half for each side;
    * self-matches out of domain. A model that never appeared on one
    * side reports 0 matches and 0 milli for that side (the divide
    * guard — both engines replay the IF, no NULL in the hash).
    *
    * Plan shape: one scan; each match explodes ROW-LOCALLY into its
    * two (model, side) contributions, and the partial agg compacts to
    * |models| rows per partition before the single model-keyed
    * exchange — at 100 TB of judgments the post-shuffle frame is
    * |models| rows. The gap is a DIFFERENCE of two non-negative
    * already-divided millis (never a signed division — the repo-wide
    * div/floor rule).
    *
    * Reading the gap: `bias_gap_milli` is only MEANINGFUL when both
    * `n_as_a` and `n_as_b` are nonzero — a model with zero matches on
    * one side reports 0 milli for that side by the divide guard, so
    * its gap reads as maximal order bias (e.g. 1000) on zero evidence
    * (JudgeSpec pins exactly this shape). The per-side counts are in
    * the row for exactly this gating; a consumer must filter on them
    * before ranking models by gap.
    */
  def positionBias(df: DataFrame, a: String, b: String,
                   winner: String): DataFrame =
    df.where(col(a) =!= col(b))
      .select(explode(array(
        struct(col(a).as("m"), lit(1L).as("is_a"),
          when(col(winner) === col(a), lit(2L))
            .when(col(winner) === col(b), lit(0L))
            .otherwise(lit(1L)).as("hw")),
        struct(col(b).as("m"), lit(0L).as("is_a"),
          when(col(winner) === col(b), lit(2L))
            .when(col(winner) === col(a), lit(0L))
            .otherwise(lit(1L)).as("hw")))).as("r"))
      .groupBy(col("r.m").as("model"))
      .agg(sum(col("r.is_a")).as("n_as_a"),
        sum(when(col("r.is_a") === 1L, col("r.hw")).otherwise(lit(0L)))
          .as("__hw_a"),
        sum(lit(1L) - col("r.is_a")).as("n_as_b"),
        sum(when(col("r.is_a") === 0L, col("r.hw")).otherwise(lit(0L)))
          .as("__hw_b"))
      .select(col("model"), col("n_as_a"),
        expr("IF(n_as_a = 0, cast(0 AS BIGINT), " +
          "cast(__hw_a * 1000 div (n_as_a * 2) AS BIGINT))")
          .as("as_a_milli"),
        col("n_as_b"),
        expr("IF(n_as_b = 0, cast(0 AS BIGINT), " +
          "cast(__hw_b * 1000 div (n_as_b * 2) AS BIGINT))")
          .as("as_b_milli"))
      .withColumn("bias_gap_milli", col("as_a_milli") - col("as_b_milli"))

  /** DuckDB twin of [[positionBias]]. */
  def positionBiasSql(table: String, a: String, b: String,
                      winner: String): String =
    s"""SELECT model, n_as_a, as_a_milli, n_as_b, as_b_milli,
       |  (as_a_milli - as_b_milli)::BIGINT AS bias_gap_milli
       |FROM (
       |  SELECT m AS model,
       |    sum(is_a)::BIGINT AS n_as_a,
       |    CASE WHEN sum(is_a) = 0 THEN 0
       |         ELSE sum(CASE WHEN is_a = 1 THEN hw ELSE 0 END) * 1000
       |           // (sum(is_a) * 2) END::BIGINT AS as_a_milli,
       |    sum(1 - is_a)::BIGINT AS n_as_b,
       |    CASE WHEN sum(1 - is_a) = 0 THEN 0
       |         ELSE sum(CASE WHEN is_a = 0 THEN hw ELSE 0 END) * 1000
       |           // (sum(1 - is_a) * 2) END::BIGINT AS as_b_milli
       |  FROM (
       |    SELECT $a AS m, 1 AS is_a,
       |      CASE WHEN $winner = $a THEN 2
       |           WHEN $winner = $b THEN 0 ELSE 1 END AS hw
       |    FROM $table WHERE $a <> $b
       |    UNION ALL
       |    SELECT $b AS m, 0 AS is_a,
       |      CASE WHEN $winner = $b THEN 2
       |           WHEN $winner = $a THEN 0 ELSE 1 END AS hw
       |    FROM $table WHERE $a <> $b)
       |  GROUP BY m)""".stripMargin

  /** LENGTH-BIAS report (round 18) — the verbosity audit, the arena
    * literature's second-best-documented judge artifact after position
    * bias: LLM judges systematically favor the LONGER response, and a
    * corpus where the longer side's win rate rises with the length gap
    * is measuring verbosity, not quality. Matches are bucketed by the
    * absolute response-length difference (fixed-width bins, top bin
    * open, the [[Preference.rmCalibration]] convention) and each
    * bucket reports the LONGER side's win rate in milli — half-win
    * scoring exactly as [[pairAgg]] (an unmatched/NULL winner is a
    * tie). Equal-length matches are their own bucket (`bin = -1`):
    * there is no longer side to credit, and folding them anywhere
    * else would dilute the profile. Self-matches AND NULL-length
    * matches are out of domain (dropped): a NULL length has no
    * defensible bucket — without the guard, both engines' NULL-skipping
    * `least` filed such rows into the capped top bin and the degraded
    * longer-side CASE could credit them as decisive wins, fabricating
    * a verbosity spike exactly where the audit looks (round-18
    * self-review finding; oracle-blind because both engines agreed).
    * A healthy judge reads ~500 flat across bins; a rising curve is
    * the bias.
    *
    * Plan shape: one scan into a |bins|-row partial-agged exchange —
    * the response TEXT never moves, only its precomputed lengths.
    */
  def lengthBias(df: DataFrame, a: String, b: String, winner: String,
                 lenA: String, lenB: String, binWidth: Int = 200,
                 bins: Int = 8): DataFrame =
    df.where(col(a) =!= col(b) &&
        col(lenA).isNotNull && col(lenB).isNotNull)
      .select(
        expr(s"IF($lenA = $lenB, CAST(-1 AS BIGINT), " +
          s"least(abs($lenA - $lenB) div $binWidth, " +
          s"CAST(${bins - 1} AS BIGINT)))").as("bin"),
        when(col(lenA) === col(lenB), lit(1L)) // no longer side: tie row
          .when(col(winner) === when(col(lenA) > col(lenB), col(a))
            .otherwise(col(b)), lit(2L))
          .when(col(winner) === when(col(lenA) > col(lenB), col(b))
            .otherwise(col(a)), lit(0L))
          .otherwise(lit(1L)).as("__hw"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_matches"), sum(col("__hw")).as("__s"))
      .select(col("bin"), col("n_matches"),
        expr("CAST(__s * 1000 div (n_matches * 2) AS BIGINT)")
          .as("longer_win_milli"))

  /** DuckDB twin of [[lengthBias]]. */
  def lengthBiasSql(table: String, a: String, b: String, winner: String,
                    lenA: String, lenB: String, binWidth: Int = 200,
                    bins: Int = 8): String =
    s"""SELECT bin, count(*) AS n_matches,
       |  (sum(hw) * 1000 // (count(*) * 2))::BIGINT AS longer_win_milli
       |FROM (
       |  SELECT CASE WHEN $lenA = $lenB THEN -1
       |              ELSE least(abs($lenA - $lenB) // $binWidth, ${bins - 1})
       |         END::BIGINT AS bin,
       |    CASE WHEN $lenA = $lenB THEN 1
       |         WHEN $winner = (CASE WHEN $lenA > $lenB THEN $a ELSE $b END)
       |           THEN 2
       |         WHEN $winner = (CASE WHEN $lenA > $lenB THEN $b ELSE $a END)
       |           THEN 0
       |         ELSE 1 END AS hw
       |  FROM $table
       |  WHERE $a <> $b AND $lenA IS NOT NULL AND $lenB IS NOT NULL)
       |GROUP BY bin""".stripMargin

  /** Inter-judge AGREEMENT at judge-pair grain — the trust check on a
    * multi-judge labeling table `(item, judge, verdict)`: for every
    * unordered judge pair, how many items both judged and how often
    * their verdicts matched, in integer milli. Raw agreement (not a
    * chance-corrected kappa: kappa's `(po−pe)/(1−pe)` is SIGNED —
    * the repo convention keeps signed quantities as sums/counts and
    * never divides them (probed round 18: both engines actually
    * truncate toward zero, but the convention stays — it keeps every
    * hashed ratio's rounding direction trivially auditable); po and
    * the per-pair counts let a reader derive any correction
    * downstream in float land).
    *
    * Re-annotation: the input collapses to ONE verdict per
    * (item, judge) first — min(verdict), an arbitrary-but-
    * deterministic pick both engines replay — so a judge who labeled
    * an item twice cannot double-weight that item in n_common (and a
    * self-conflicting judge contributes their lexicographically-least
    * label, not two rows).
    *
    * Plan shape: NOT a self-join — that formulation scans and
    * aggregates the label table twice and shuffles it twice (probed
    * 42-119s at 60M labels). Instead: one (item, judge) partial agg,
    * one item-keyed collect of the per-item judge list, then the
    * judge pairs explode ROW-LOCALLY from the sorted array (judges²
    * per item) into the judge-pair partial agg. Two sequential
    * exchanges of label-grain rows, no join (probed 27s warm at the
    * same 60M labels, fixture-fused — roughly half the join
    * formulation's best rep and a quarter of its worst, with the
    * double scan gone structurally).
    *
    * The per-item panel is small by CONVENTION, not by construction —
    * a degenerate item labeled by 10⁵ judges would make its row-local
    * explode Θ(judges²) with no backpressure. `maxJudges` is the
    * [[TextAnalysis.winnowPairs]] maxPostings guard applied here:
    * items whose (deduped) panel exceeds it are DROPPED from the pair
    * counts (bounding any row's explode at maxJudges², ~500k structs
    * at the default) — a dropped item is a curation signal, not
    * agreement evidence, and the n_common denominators stay consistent
    * because numerator and denominator both exclude it.
    */
  def agreement(df: DataFrame, item: String, judge: String,
                verdict: String, maxJudges: Int = 1000): DataFrame =
    df.groupBy(col(item).as("__i"), col(judge).as("__j"))
      .agg(min(col(verdict)).as("__v"))
      .groupBy(col("__i"))
      // array_sort on structs orders by the first field — the judge —
      // and judges are distinct after the dedup, so the order (and
      // every emitted pair's ja < jb) is deterministic
      .agg(array_sort(collect_list(struct(col("__j").as("j"),
        col("__v").as("v")))).as("__xs"))
      .where(size(col("__xs")) <= maxJudges)
      .select(explode(expr(
        "flatten(transform(__xs, (x, i) -> " +
          "transform(slice(__xs, i + 2, size(__xs) - i - 1), y -> " +
          "named_struct('ja', x.j, 'jb', y.j, " +
          // NULL = NULL is NULL, not an agreement — coalesce to false
          "'agree', coalesce(x.v = y.v, false)))))")).as("p"))
      .groupBy(col("p.ja").as("judge_a"), col("p.jb").as("judge_b"))
      .agg(count(lit(1)).as("n_common"),
        sum(when(col("p.agree"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agree_milli",
        expr("cast(n_agree * 1000 div n_common AS BIGINT)"))

  /** DuckDB twin of [[agreement]] (the join formulation is fine at
    * oracle scale; the maxJudges panel guard mirrors the Spark side).
    */
  def agreementSql(table: String, item: String, judge: String,
                   verdict: String, maxJudges: Int = 1000): String =
    s"""WITH one AS (
       |  SELECT $item AS i, $judge AS j, min($verdict) AS v
       |  FROM $table GROUP BY 1, 2),
       |ok AS (SELECT i FROM one GROUP BY i HAVING count(*) <= $maxJudges)
       |SELECT l.j AS judge_a, r.j AS judge_b,
       |  count(*) AS n_common,
       |  sum(CASE WHEN l.v = r.v THEN 1 ELSE 0 END)::BIGINT AS n_agree,
       |  (sum(CASE WHEN l.v = r.v THEN 1 ELSE 0 END) * 1000
       |    // count(*))::BIGINT AS agree_milli
       |FROM one l JOIN one r ON l.i = r.i AND l.j < r.j
       |JOIN ok ON ok.i = l.i
       |GROUP BY 1, 2""".stripMargin

  /** CHANCE-CORRECTED agreement (Cohen's kappa) per judge pair, in
    * integer milli — the correction [[agreement]] deliberately leaves
    * to the consumer, computed engine-side: with skewed verdict
    * distributions raw agreement is inflated (two judges who both say
    * 'good' 90% of the time agree ~82% by chance alone), and every
    * serious annotation pipeline reads κ = (p_o − p_e)/(1 − p_e),
    * where p_e = Σ_k p_a(k)·p_b(k) over each judge's verdict marginal
    * on their COMMON items.
    *
    * Integer arithmetic: `po_milli = n_agree·1000 div n`,
    * `pe_milli = S·1000 div n²` with `S = Σ_k cnt_a(k)·cnt_b(k)`
    * exact, then
    * `kappa_milli = (po_milli − pe_milli)·1000 div (1000 − pe_milli)`.
    * The numerator is SIGNED — the ONE sanctioned signed division in a
    * hashed column, explicitly safe because both engines were PROBED
    * to truncate toward zero (`-7 // 2 = -3` on DuckDB, Spark `div` by
    * definition; the repo keeps the avoid-signed-division convention
    * elsewhere for auditability, but kappa's whole point is the
    * corrected ratio and the po/pe columns ride along for any
    * downstream re-derivation). `pe_milli = 1000` (both judges
    * constant on the SAME verdict — the only way S = n²) is its own
    * reported class: `degenerate = 1`, `kappa_milli = 0`, because
    * 0/0 is a report of no-information, not a number.
    *
    * Domain: NULL verdicts are OUT (both dialects filter them before
    * the panel dedup) — kappa's marginals need a category and NULL has
    * none — and so are NULL item/judge ids (round-19 self-review: the
    * Spark pipeline would group a NULL key into a panel while the
    * twin's equi-join silently drops it — an oracle-blind divergence
    * class; a NULL id is a malformed label row, not a panel); [[agreement]] instead counts NULL-vs-NULL as disagreement,
    * so n_common can differ between the two reports on a corpus with
    * NULL labels (documented divergence). Re-annotation collapses to
    * min(verdict) per (item, judge) and oversized panels drop WHOLE
    * (`maxJudges`), both exactly as [[agreement]].
    *
    * Plan shape: the [[agreement]] pipeline with the pair explode
    * widened to per-category contribution rows — each co-judged pair
    * emits ONE row when the verdicts match and two otherwise (still
    * row-local, still ≤ maxJudges² per item), then two sequential
    * partial-agged exchanges land at (pair × category) grain and
    * pair grain — both metadata-sized. No self-join, one scan.
    * Range: `S·1000` needs `n_common ≲ 3·10⁷` per judge pair to stay
    * inside 64 bits (S ≤ n²); past that Spark's ANSI mode THROWS
    * (loudly, not a silent divergence — DuckDB's HUGEINT would keep
    * going) — two judges co-labeling 30M+ common items should be
    * sampled before auditing anyway. Round 20 makes that bound
    * SELF-DEFENDING: `maxCommon` (default 3·10⁷, the documented
    * 64-bit limit) guards every pair with an explicit `raise_error` /
    * `error()` BEFORE the S·1000 term is formed, so the failure names
    * the pair and the remedy ("sample the pair first") instead of
    * surfacing as an anonymous ANSI overflow mid-aggregation
    * (spec-pinned loud path in JudgeSpec).
    */
  def kappa(df: DataFrame, item: String, judge: String,
            verdict: String, maxJudges: Int = 1000,
            maxCommon: Long = 30000000L): DataFrame =
    df.where(col(verdict).isNotNull && col(item).isNotNull &&
        col(judge).isNotNull)
      .groupBy(col(item).as("__i"), col(judge).as("__j"))
      .agg(min(col(verdict)).as("__v"))
      .groupBy(col("__i"))
      .agg(array_sort(collect_list(struct(col("__j").as("j"),
        col("__v").as("v")))).as("__xs"))
      .where(size(col("__xs")) <= maxJudges)
      .select(explode(expr(
        "flatten(transform(__xs, (x, i) -> " +
          "flatten(transform(slice(__xs, i + 2, size(__xs) - i - 1), y -> " +
          "IF(x.v = y.v, " +
          "array(named_struct('ja', x.j, 'jb', y.j, 'k', x.v, " +
          "'ca', cast(1 AS BIGINT), 'cb', cast(1 AS BIGINT))), " +
          "array(named_struct('ja', x.j, 'jb', y.j, 'k', x.v, " +
          "'ca', cast(1 AS BIGINT), 'cb', cast(0 AS BIGINT)), " +
          "named_struct('ja', x.j, 'jb', y.j, 'k', y.v, " +
          "'ca', cast(0 AS BIGINT), 'cb', cast(1 AS BIGINT))))))))"))
        .as("p"))
      .groupBy(col("p.ja").as("judge_a"), col("p.jb").as("judge_b"),
        col("p.k").as("__k"))
      .agg(sum(col("p.ca")).as("__sa"), sum(col("p.cb")).as("__sb"),
        sum(col("p.ca") * col("p.cb")).as("__agr"))
      .groupBy(col("judge_a"), col("judge_b"))
      .agg(sum(col("__sa")).as("n_common"), sum(col("__agr")).as("n_agree"),
        sum(col("__sa") * col("__sb")).as("__s"))
      .select(col("judge_a"), col("judge_b"), col("n_common"),
        col("n_agree"),
        expr("cast(n_agree * 1000 div n_common AS BIGINT)").as("po_milli"),
        expr(s"IF(n_common > $maxCommon, " +
          "raise_error(concat('graft kappa: pair (', cast(judge_a AS STRING), " +
          "', ', cast(judge_b AS STRING), ') has n_common = ', " +
          s"cast(n_common AS STRING), ' > maxCommon = $maxCommon — " +
          "the S*1000 term would leave 64 bits; sample the pair first')), " +
          "cast(__s * 1000 div (n_common * n_common) AS BIGINT))")
          .as("pe_milli"))
      .select(col("judge_a"), col("judge_b"), col("n_common"),
        col("n_agree"), col("po_milli"), col("pe_milli"),
        expr("cast(IF(pe_milli = 1000, 1, 0) AS BIGINT)").as("degenerate"),
        expr("IF(pe_milli = 1000, cast(0 AS BIGINT), " +
          "cast((po_milli - pe_milli) * 1000 div (1000 - pe_milli) AS BIGINT))")
          .as("kappa_milli"))

  /** DuckDB twin of [[kappa]] (the join formulation at oracle scale,
    * as [[agreementSql]]; the marginal product joins only on SHARED
    * categories — a category one judge never used contributes 0 to S).
    */
  def kappaSql(table: String, item: String, judge: String,
               verdict: String, maxJudges: Int = 1000,
               maxCommon: Long = 30000000L): String =
    s"""WITH one AS (
       |  SELECT $item AS i, $judge AS j, min($verdict) AS v
       |  FROM $table WHERE $verdict IS NOT NULL
       |    AND $item IS NOT NULL AND $judge IS NOT NULL GROUP BY 1, 2),
       |ok AS (SELECT i FROM one GROUP BY i HAVING count(*) <= $maxJudges),
       |pr AS (
       |  SELECT l.j AS ja, r.j AS jb, l.v AS va, r.v AS vb
       |  FROM one l JOIN one r ON l.i = r.i AND l.j < r.j
       |  JOIN ok ON ok.i = l.i),
       |a AS (
       |  SELECT ja, jb, count(*) AS n,
       |    sum(CASE WHEN va = vb THEN 1 ELSE 0 END)::BIGINT AS agree
       |  FROM pr GROUP BY 1, 2),
       |ma AS (SELECT ja, jb, va AS k, count(*) AS sa FROM pr GROUP BY 1, 2, 3),
       |mb AS (SELECT ja, jb, vb AS k, count(*) AS sb FROM pr GROUP BY 1, 2, 3),
       |s AS (
       |  SELECT ma.ja, ma.jb, sum(ma.sa * mb.sb)::BIGINT AS s
       |  FROM ma JOIN mb ON ma.ja = mb.ja AND ma.jb = mb.jb AND ma.k = mb.k
       |  GROUP BY 1, 2)
       |SELECT judge_a, judge_b, n_common, n_agree, po_milli, pe_milli,
       |  (CASE WHEN pe_milli = 1000 THEN 1 ELSE 0 END)::BIGINT AS degenerate,
       |  (CASE WHEN pe_milli = 1000 THEN 0
       |        ELSE (po_milli - pe_milli) * 1000 // (1000 - pe_milli)
       |   END)::BIGINT AS kappa_milli
       |FROM (
       |  SELECT a.ja AS judge_a, a.jb AS judge_b, a.n AS n_common,
       |    a.agree AS n_agree,
       |    (a.agree * 1000 // a.n)::BIGINT AS po_milli,
       |    (CASE WHEN a.n > $maxCommon
       |          THEN error('graft kappa: n_common > maxCommon — sample the pair first')
       |          ELSE coalesce(s.s, 0) * 1000 // (a.n * a.n) END)::BIGINT AS pe_milli
       |  FROM a LEFT JOIN s ON a.ja = s.ja AND a.jb = s.jb)""".stripMargin

  /** WEIGHTED kappa per judge pair (round 20) — [[kappa]] for ORDINAL
    * verdicts (Likert 1-5 scores, rubric grades), where a 4-vs-5
    * disagreement must weigh less than a 1-vs-5: Cohen's weighted
    * kappa `κ_w = 1 − Σ w·o / Σ w·e` with the standard LINEAR
    * (`w = |a−b|`) and QUADRATIC (`w = (a−b)²`) disagreement weights,
    * both reported side by side (quadratic weighted kappa is the one
    * equivalent to an ICC; linear is what rubric pipelines quote).
    *
    * Exact integers end to end — the weights are exact integers over
    * a bounded category range, so both numerator and denominator stay
    * exact: per pair with `n` common items,
    * `Do = Σ_items w(v_a, v_b)` (observed weighted disagreement) and
    * `De = Σ_{k,l} cnt_a(k)·cnt_b(l)·w(k,l)` (expected, scaled by n²
    * relative to the probability form), giving
    * `kappa_milli = 1000 − Do·n·1000 div De` — ONE truncating
    * division of a NON-NEGATIVE ratio (both Do and De are sums of
    * non-negative terms; no signed division anywhere, unlike
    * [[kappa]]'s sanctioned corrected ratio). Cross-check: with 0/1
    * weights this is algebraically [[kappa]]'s
    * `(po − pe)/(1 − pe)` before milli truncation (JudgeSpec pins the
    * near-agreement: a pair disagreeing by one rubric point on every
    * item scores LOW unweighted but HIGH weighted).
    *
    * `De = 0` iff the marginals put mass only on zero-weight cells —
    * i.e. both judges constant on the SAME score (exactly [[kappa]]'s
    * `pe = 1000` class): reported as `degenerate = 1`,
    * `kappa_*_milli = 0` (identical for linear and quadratic — the
    * weights share a zero set).
    *
    * Domain: scores must be INTEGER-VALUED ordinals (cast to BIGINT —
    * Spark truncates a fractional DOUBLE toward zero and the twin
    * routes through truncToZero to match; a non-numeric string throws
    * under ANSI, loudly). NULL score/item/judge ids are out (the
    * [[kappa]] stance); re-annotation collapses to min(score) per
    * (item, judge); panels above `maxJudges` drop WHOLE. A pair using
    * more than `maxCats` distinct score values drops WHOLE (the
    * collected per-pair category array bounds row-local state — a
    * continuous "score" column is out of domain, and 64 categories is
    * far above any rubric; the drop is the maxJudges convention).
    *
    * Range: `Do·n·1000 ≤ n²·w_max·1000` needs
    * `n ≲ 3·10⁷/√w_max` per pair inside 64 bits (w_max = R² for
    * quadratic over score span R — a 0-10 rubric gives n ≲ 3·10⁶);
    * past it ANSI throws loudly, the [[kappa]] maxCommon class —
    * sample first.
    *
    * Plan shape: the [[kappa]] pipeline — one scan, (item, judge)
    * dedup, per-item sorted panel collect with the maxJudges guard,
    * row-local ≤ maxJudges² pair explode carrying per-category
    * marginal contributions AND the observed weighted sums on the
    * same rows, then (pair × category) and pair-grain partial-agged
    * exchanges (both metadata-sized). De is computed ROW-LOCALLY at
    * pair grain from the collected ≤ maxCats category array (the
    * nested O(maxCats²) fold), so the Spark side never self-joins;
    * the join formulation lives only in the DuckDB twin at oracle
    * scale.
    */
  def kappaWeighted(df: DataFrame, item: String, judge: String,
                    score: String, maxJudges: Int = 1000,
                    maxCats: Int = 64): DataFrame =
    df.where(col(score).isNotNull && col(item).isNotNull &&
        col(judge).isNotNull)
      .select(col(item).as("__i"), col(judge).as("__j"),
        col(score).cast("long").as("__v"))
      .groupBy(col("__i"), col("__j"))
      .agg(min(col("__v")).as("__v"))
      .groupBy(col("__i"))
      .agg(array_sort(collect_list(struct(col("__j").as("j"),
        col("__v").as("v")))).as("__xs"))
      .where(size(col("__xs")) <= maxJudges)
      .select(explode(expr(
        "flatten(transform(__xs, (x, i) -> " +
          "flatten(transform(slice(__xs, i + 2, size(__xs) - i - 1), y -> " +
          "IF(x.v = y.v, " +
          "array(named_struct('ja', x.j, 'jb', y.j, 'k', x.v, " +
          "'ca', cast(1 AS BIGINT), 'cb', cast(1 AS BIGINT), " +
          "'dl', cast(0 AS BIGINT), 'dq', cast(0 AS BIGINT))), " +
          "array(named_struct('ja', x.j, 'jb', y.j, 'k', x.v, " +
          "'ca', cast(1 AS BIGINT), 'cb', cast(0 AS BIGINT), " +
          "'dl', abs(x.v - y.v), 'dq', (x.v - y.v) * (x.v - y.v)), " +
          "named_struct('ja', x.j, 'jb', y.j, 'k', y.v, " +
          "'ca', cast(0 AS BIGINT), 'cb', cast(1 AS BIGINT), " +
          "'dl', cast(0 AS BIGINT), 'dq', cast(0 AS BIGINT))))))))"))
        .as("p"))
      .groupBy(col("p.ja").as("judge_a"), col("p.jb").as("judge_b"),
        col("p.k").as("__k"))
      .agg(sum(col("p.ca")).as("__sa"), sum(col("p.cb")).as("__sb"),
        sum(col("p.dl")).as("__dl"), sum(col("p.dq")).as("__dq"))
      .groupBy(col("judge_a"), col("judge_b"))
      .agg(sum(col("__sa")).as("n_common"),
        sum(col("__dl")).as("dw_lin"), sum(col("__dq")).as("dw_quad"),
        array_sort(collect_list(struct(col("__k").as("k"),
          col("__sa").as("sa"), col("__sb").as("sb")))).as("__cats"))
      .where(size(col("__cats")) <= maxCats)
      .select(col("judge_a"), col("judge_b"), col("n_common"),
        col("dw_lin"), col("dw_quad"),
        expr("aggregate(__cats, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.sa * aggregate(__cats, cast(0 AS BIGINT), (a2, c2) -> " +
          "a2 + c2.sb * abs(c1.k - c2.k)))").as("__del"),
        expr("aggregate(__cats, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.sa * aggregate(__cats, cast(0 AS BIGINT), (a2, c2) -> " +
          "a2 + c2.sb * (c1.k - c2.k) * (c1.k - c2.k)))").as("__deq"))
      .select(col("judge_a"), col("judge_b"), col("n_common"),
        col("dw_lin"), col("dw_quad"),
        expr("cast(IF(__del = 0, 1, 0) AS BIGINT)").as("degenerate"),
        expr("IF(__del = 0, cast(0 AS BIGINT), " +
          "cast(1000 - dw_lin * n_common * 1000 div __del AS BIGINT))")
          .as("kappa_lin_milli"),
        expr("IF(__deq = 0, cast(0 AS BIGINT), " +
          "cast(1000 - dw_quad * n_common * 1000 div __deq AS BIGINT))")
          .as("kappa_quad_milli"))

  /** DuckDB twin of [[kappaWeighted]] (the join formulation at oracle
    * scale, as [[kappaSql]]: the expected weighted disagreement is
    * the full marginal cross product within each pair — the category
    * pair count is bounded by maxCats², and the maxCats whole-pair
    * drop mirrors the Spark side's collected-array guard via the
    * deduped union of both judges' score sets).
    */
  def kappaWeightedSql(table: String, item: String, judge: String,
                       score: String, maxJudges: Int = 1000,
                       maxCats: Int = 64): String =
    s"""WITH one AS (
       |  SELECT $item AS i, $judge AS j,
       |    min(${graft.ops.PortableHash.truncToZero(score)}) AS v
       |  FROM $table WHERE $score IS NOT NULL
       |    AND $item IS NOT NULL AND $judge IS NOT NULL GROUP BY 1, 2),
       |ok AS (SELECT i FROM one GROUP BY i HAVING count(*) <= $maxJudges),
       |pr AS (
       |  SELECT l.j AS ja, r.j AS jb, l.v AS va, r.v AS vb
       |  FROM one l JOIN one r ON l.i = r.i AND l.j < r.j
       |  JOIN ok ON ok.i = l.i),
       |a AS (
       |  SELECT ja, jb, count(*) AS n,
       |    sum(abs(va - vb))::BIGINT AS dl,
       |    sum((va - vb) * (va - vb))::BIGINT AS dq
       |  FROM pr GROUP BY 1, 2),
       |nc AS (
       |  SELECT ja, jb, count(*) AS ncats
       |  FROM (SELECT ja, jb, va AS k FROM pr
       |        UNION SELECT ja, jb, vb AS k FROM pr)
       |  GROUP BY 1, 2),
       |ma AS (SELECT ja, jb, va AS k, count(*) AS sa FROM pr GROUP BY 1, 2, 3),
       |mb AS (SELECT ja, jb, vb AS k, count(*) AS sb FROM pr GROUP BY 1, 2, 3),
       |de AS (
       |  SELECT ma.ja, ma.jb,
       |    sum(ma.sa * mb.sb * abs(ma.k - mb.k))::BIGINT AS del,
       |    sum(ma.sa * mb.sb * (ma.k - mb.k) * (ma.k - mb.k))::BIGINT AS deq
       |  FROM ma JOIN mb ON ma.ja = mb.ja AND ma.jb = mb.jb
       |  GROUP BY 1, 2)
       |SELECT a.ja AS judge_a, a.jb AS judge_b, a.n AS n_common,
       |  a.dl AS dw_lin, a.dq AS dw_quad,
       |  (CASE WHEN de.del = 0 THEN 1 ELSE 0 END)::BIGINT AS degenerate,
       |  (CASE WHEN de.del = 0 THEN 0
       |        ELSE 1000 - a.dl * a.n * 1000 // de.del END)::BIGINT
       |    AS kappa_lin_milli,
       |  (CASE WHEN de.deq = 0 THEN 0
       |        ELSE 1000 - a.dq * a.n * 1000 // de.deq END)::BIGINT
       |    AS kappa_quad_milli
       |FROM a
       |JOIN nc ON a.ja = nc.ja AND a.jb = nc.jb
       |JOIN de ON a.ja = de.ja AND a.jb = de.jb
       |WHERE nc.ncats <= $maxCats""".stripMargin

  /** RANK CONCORDANCE per judge pair (round 20) — the Kendall-tau
    * ingredient counts for ORDINAL scores, completing the ordinal
    * family next to [[kappaWeighted]] (weighted kappa asks "how far
    * apart are the scores"; concordance asks "do the judges RANK
    * items the same way", which survives judges with different
    * calibration offsets — a judge who scores everything one point
    * lower than their peer is perfectly concordant but kappa-hostile):
    * over each pair's common items, the exact pair-classification
    * counts — concordant, discordant, tied-on-a-only, tied-on-b-only,
    * tied-on-both — from which the consumer composes τ_a / τ_b /
    * gamma in float land (every tau variant divides the SIGNED margin
    * C − D by some tie-corrected denominator — the no-signed-division
    * convention leaves the counts exact and the ratio to the reader).
    *
    * Exact integers via the JOINT CONTINGENCY TABLE, never item
    * pairs: with cells n(ka, kb) over ≤ maxCats² ordinal score
    * combinations, `C = Σ_cell n·N(>,>)`, `D = Σ_cell n·N(>,<)`
    * (each item pair counted exactly once — the strictly-greater
    * iteration), and the tie counts from row/column/cell marginals
    * (`Σ m(m−1) div 2` — exact, the product is even). Range:
    * products are ≤ n², fine to n ≈ 3·10⁹ common items per pair.
    *
    * Domain exactly as [[kappaWeighted]]: integer-valued ordinal
    * scores (cast/truncToZero), NULL score/item/judge out,
    * min()-collapse per (item, judge), panels above maxJudges and
    * pairs using more than maxCats distinct scores drop WHOLE.
    *
    * Plan shape: the kappa pipeline — one scan, (item, judge) dedup,
    * panel collect, row-local pair explode carrying (ka, kb), then
    * (pair × ka × kb) and pair-grain partial-agged exchanges; C/D
    * are a row-local O(maxCats⁴ worst-case, cats⁴ ≤ 64⁴ only for a
    * pair that actually uses 64 distinct scores — rubrics use ≤ 10)
    * nested fold over the collected joint cells. No self-join on the
    * Spark side; the twin joins cells at oracle scale.
    */
  def rankConcordance(df: DataFrame, item: String, judge: String,
                      score: String, maxJudges: Int = 1000,
                      maxCats: Int = 64): DataFrame =
    df.where(col(score).isNotNull && col(item).isNotNull &&
        col(judge).isNotNull)
      .select(col(item).as("__i"), col(judge).as("__j"),
        col(score).cast("long").as("__v"))
      .groupBy(col("__i"), col("__j"))
      .agg(min(col("__v")).as("__v"))
      .groupBy(col("__i"))
      .agg(array_sort(collect_list(struct(col("__j").as("j"),
        col("__v").as("v")))).as("__xs"))
      .where(size(col("__xs")) <= maxJudges)
      .select(explode(expr(
        "flatten(transform(__xs, (x, i) -> " +
          "transform(slice(__xs, i + 2, size(__xs) - i - 1), y -> " +
          "named_struct('ja', x.j, 'jb', y.j, 'ka', x.v, 'kb', y.v))))"))
        .as("p"))
      .groupBy(col("p.ja").as("judge_a"), col("p.jb").as("judge_b"),
        col("p.ka").as("__ka"), col("p.kb").as("__kb"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("judge_a"), col("judge_b"))
      .agg(sum(col("__n")).as("n_common"),
        array_sort(collect_list(struct(col("__ka").as("ka"),
          col("__kb").as("kb"), col("__n").as("n")))).as("__cells"),
        expr("cast(size(collect_set(__ka)) AS BIGINT)").as("__nca"),
        expr("cast(size(collect_set(__kb)) AS BIGINT)").as("__ncb"))
      .where(col("__nca") <= maxCats && col("__ncb") <= maxCats)
      .select(col("judge_a"), col("judge_b"), col("n_common"),
        expr("cast(n_common * (n_common - 1) div 2 AS BIGINT)")
          .as("n_pairs"),
        expr("aggregate(__cells, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.n * aggregate(__cells, cast(0 AS BIGINT), (a2, c2) -> " +
          "a2 + IF(c2.ka > c1.ka AND c2.kb > c1.kb, c2.n, cast(0 AS BIGINT))))")
          .as("n_concordant"),
        expr("aggregate(__cells, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.n * aggregate(__cells, cast(0 AS BIGINT), (a2, c2) -> " +
          "a2 + IF(c2.ka > c1.ka AND c2.kb < c1.kb, c2.n, cast(0 AS BIGINT))))")
          .as("n_discordant"),
        expr("aggregate(__cells, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.n * aggregate(__cells, cast(0 AS BIGINT), (a2, c2) -> " +
          "a2 + IF(c2.ka = c1.ka AND c2.kb > c1.kb, c2.n, cast(0 AS BIGINT))))")
          .as("__ta"),
        expr("aggregate(__cells, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.n * aggregate(__cells, cast(0 AS BIGINT), (a2, c2) -> " +
          "a2 + IF(c2.ka > c1.ka AND c2.kb = c1.kb, c2.n, cast(0 AS BIGINT))))")
          .as("__tb"),
        expr("aggregate(__cells, cast(0 AS BIGINT), (a1, c1) -> a1 + " +
          "c1.n * (c1.n - 1) div 2)").as("n_tied_both"))
      .select(col("judge_a"), col("judge_b"), col("n_common"),
        col("n_pairs"), col("n_concordant"), col("n_discordant"),
        col("__ta").as("n_tied_a"), col("__tb").as("n_tied_b"),
        col("n_tied_both"))

  /** DuckDB twin of [[rankConcordance]] (joint-cell self-joins at
    * oracle scale; ties-on-one-axis counted as ka-equal/kb-greater
    * cell pairs exactly as the Spark fold, so tied_a/tied_b EXCLUDE
    * tied-both by construction).
    */
  def rankConcordanceSql(table: String, item: String, judge: String,
                         score: String, maxJudges: Int = 1000,
                         maxCats: Int = 64): String =
    s"""WITH one AS (
       |  SELECT $item AS i, $judge AS j,
       |    min(${graft.ops.PortableHash.truncToZero(score)}) AS v
       |  FROM $table WHERE $score IS NOT NULL
       |    AND $item IS NOT NULL AND $judge IS NOT NULL GROUP BY 1, 2),
       |ok AS (SELECT i FROM one GROUP BY i HAVING count(*) <= $maxJudges),
       |pr AS (
       |  SELECT l.j AS ja, r.j AS jb, l.v AS ka, r.v AS kb
       |  FROM one l JOIN one r ON l.i = r.i AND l.j < r.j
       |  JOIN ok ON ok.i = l.i),
       |cells AS (
       |  SELECT ja, jb, ka, kb, count(*) AS n
       |  FROM pr GROUP BY 1, 2, 3, 4),
       |keep AS (
       |  SELECT ja, jb FROM cells GROUP BY 1, 2
       |  HAVING count(DISTINCT ka) <= $maxCats
       |    AND count(DISTINCT kb) <= $maxCats),
       |base AS (
       |  SELECT c.ja, c.jb, sum(c.n)::BIGINT AS n_common,
       |    sum(c.n * (c.n - 1) // 2)::BIGINT AS tied_both
       |  FROM cells c JOIN keep USING (ja, jb) GROUP BY 1, 2),
       |cd AS (
       |  SELECT a.ja, a.jb,
       |    sum(CASE WHEN b.ka > a.ka AND b.kb > a.kb
       |             THEN a.n * b.n ELSE 0 END)::BIGINT AS conc,
       |    sum(CASE WHEN b.ka > a.ka AND b.kb < a.kb
       |             THEN a.n * b.n ELSE 0 END)::BIGINT AS disc,
       |    sum(CASE WHEN b.ka = a.ka AND b.kb > a.kb
       |             THEN a.n * b.n ELSE 0 END)::BIGINT AS ta,
       |    sum(CASE WHEN b.ka > a.ka AND b.kb = a.kb
       |             THEN a.n * b.n ELSE 0 END)::BIGINT AS tb
       |  FROM cells a
       |  JOIN cells b ON a.ja = b.ja AND a.jb = b.jb
       |  JOIN keep ON keep.ja = a.ja AND keep.jb = a.jb
       |  GROUP BY 1, 2)
       |SELECT base.ja AS judge_a, base.jb AS judge_b, base.n_common,
       |  (base.n_common * (base.n_common - 1) // 2)::BIGINT AS n_pairs,
       |  coalesce(cd.conc, 0)::BIGINT AS n_concordant,
       |  coalesce(cd.disc, 0)::BIGINT AS n_discordant,
       |  coalesce(cd.ta, 0)::BIGINT AS n_tied_a,
       |  coalesce(cd.tb, 0)::BIGINT AS n_tied_b,
       |  base.tied_both AS n_tied_both
       |FROM base LEFT JOIN cd ON base.ja = cd.ja AND base.jb = cd.jb""".stripMargin

  /** FLEISS' kappa per panel size (round 19) — the board-level
    * chance-corrected agreement for multi-judge panels, completing the
    * family ([[kappa]] corrects per judge PAIR; Fleiss corrects the
    * whole board at once and is what annotation-quality reports quote
    * when judges vary per item): per-item agreement
    * `P_i = (Σ_k n_ik² − n) / (n(n−1))` averaged over items, against
    * the POOLED category marginals `p_e = Σ_k (M_k / (N·n))²`. Fleiss
    * assumes a CONSTANT panel size, so items group by their (deduped,
    * non-NULL) panel size `n` and the report carries one row per n —
    * a mixed-panel corpus reads its dominant row rather than a number
    * that silently averages incompatible denominators.
    *
    * Exact integers end to end:
    * `po_milli = Σ_i (sumsq_i − n) · 1000 div (N·n·(n−1))`,
    * `pe_milli = Σ_k M_k² · 1000 div (N·n)²`, and kappa via the same
    * sanctioned signed truncating division as [[kappa]], with the
    * `pe = 1000` constant-board class reported as `degenerate = 1`.
    * Range: `(N·n)²·1000` needs `N·n ≲ 3·10⁷` per panel-size group
    * (the [[kappa]] bound class; Spark ANSI throws loudly past it).
    *
    * Same domain stances as [[kappa]]: NULL verdicts out, one verdict
    * per (item, judge) via min(), panels larger than `maxJudges`
    * dropped whole (no explode anywhere here — the guard is domain
    * consistency, not backpressure), single-judge items out (Fleiss
    * is undefined at n = 1).
    *
    * Plan shape: label-grain partial-agg exchanges — (item, judge)
    * dedup, (item, category) counts, item rollup — then an ITEM-KEYED
    * join of the category counts back to the item panel sizes, and
    * two metadata-grain aggs at (n, category) / n. The marginal
    * branch RE-DERIVES the (item, category) lineage rather than
    * caching it (the [[Trajectory.trajAdvantage]] two-branch
    * argument: the ik frame is label-grain, corpus-sized at 100 TB,
    * and `Caches.lease` stays metadata-only — a second columnar scan
    * beats spilling it), so the static plan carries ~11 exchanges of
    * which the label-grain chain appears twice; Spark's exchange
    * reuse collapses the identical subtrees at runtime. No explode
    * anywhere — roughly 2× [[agreement]]'s scan cost without the
    * judges² blowup.
    */
  def fleissKappa(df: DataFrame, item: String, judge: String,
                  verdict: String, maxJudges: Int = 1000): DataFrame = {
    val ik = df.where(col(verdict).isNotNull && col(item).isNotNull &&
        col(judge).isNotNull)
      .groupBy(col(item).as("__i"), col(judge).as("__j"))
      .agg(min(col(verdict)).as("__v"))
      .groupBy(col("__i"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val items = ik.groupBy(col("__i"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__c") * col("__c")).as("__sumsq"))
      .where(col("__n") >= 2 && col("__n") <= maxJudges)
    val byN = items.groupBy(col("__n"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__sumsq") - col("__n")).as("__pinum"))
    val marg = ik.join(items.select(col("__i"), col("__n")), Seq("__i"))
      .groupBy(col("__n"), col("__v"))
      .agg(sum(col("__c")).as("__mk"))
      .groupBy(col("__n"))
      .agg(sum(col("__mk") * col("__mk")).as("__m2"))
    byN.join(marg, Seq("__n"))
      .select(col("__n").as("panel_judges"), col("n_items"),
        expr("CAST(__pinum * 1000 div (n_items * __n * (__n - 1)) AS BIGINT)")
          .as("po_milli"),
        expr("CAST(__m2 * 1000 div (n_items * __n * n_items * __n) AS BIGINT)")
          .as("pe_milli"))
      .select(col("panel_judges"), col("n_items"), col("po_milli"),
        col("pe_milli"),
        expr("CAST(IF(pe_milli = 1000, 1, 0) AS BIGINT)").as("degenerate"),
        expr("IF(pe_milli = 1000, CAST(0 AS BIGINT), " +
          "CAST((po_milli - pe_milli) * 1000 div (1000 - pe_milli) AS BIGINT))")
          .as("kappa_milli"))
  }

  /** DuckDB twin of [[fleissKappa]]. */
  def fleissKappaSql(table: String, item: String, judge: String,
                     verdict: String, maxJudges: Int = 1000): String =
    s"""WITH one AS (
       |  SELECT $item AS i, $judge AS j, min($verdict) AS v
       |  FROM $table WHERE $verdict IS NOT NULL
       |    AND $item IS NOT NULL AND $judge IS NOT NULL GROUP BY 1, 2),
       |ik AS (SELECT i, v, count(*) AS c FROM one GROUP BY 1, 2),
       |items AS (
       |  SELECT i, sum(c)::BIGINT AS n, sum(c * c)::BIGINT AS sumsq
       |  FROM ik GROUP BY i
       |  HAVING sum(c) >= 2 AND sum(c) <= $maxJudges),
       |byn AS (
       |  SELECT n, count(*) AS n_items,
       |    sum(sumsq - n)::BIGINT AS pinum
       |  FROM items GROUP BY n),
       |marg AS (
       |  SELECT n, sum(mk * mk)::BIGINT AS m2
       |  FROM (
       |    SELECT items.n, ik.v, sum(ik.c)::BIGINT AS mk
       |    FROM ik JOIN items ON ik.i = items.i
       |    GROUP BY 1, 2)
       |  GROUP BY n)
       |SELECT panel_judges, n_items, po_milli, pe_milli,
       |  (CASE WHEN pe_milli = 1000 THEN 1 ELSE 0 END)::BIGINT AS degenerate,
       |  (CASE WHEN pe_milli = 1000 THEN 0
       |        ELSE (po_milli - pe_milli) * 1000 // (1000 - pe_milli)
       |   END)::BIGINT AS kappa_milli
       |FROM (
       |  SELECT byn.n AS panel_judges, byn.n_items,
       |    (byn.pinum * 1000 // (byn.n_items * byn.n * (byn.n - 1)))::BIGINT
       |      AS po_milli,
       |    (marg.m2 * 1000 // (byn.n_items * byn.n * byn.n_items * byn.n))::BIGINT
       |      AS pe_milli
       |  FROM byn JOIN marg ON byn.n = marg.n)""".stripMargin

  /** INTRA-judge consistency (round 19) — the self-agreement audit
    * that completes the trust ladder ([[agreement]]/[[kappa]] measure
    * judges against EACH OTHER; this measures each judge against
    * THEMSELVES): on a labeling table where some (item, judge) cells
    * carry repeated judgments (re-runs, retries, deliberate
    * test-retest probes), report per judge how many items they labeled
    * more than once and on how many of those their verdict FLIPPED —
    * the intra-rater reliability number an annotation pipeline reads
    * before trusting any single-pass label, and the direct audit of
    * the min(verdict) collapse the pair-grain reports apply upstream
    * (a high flip rate means that collapse is hiding real noise).
    *
    * `flipped` = min(verdict) ≠ max(verdict) over the cell — cheaper
    * than a distinct-count and identical on both engines. NULL
    * verdicts are out of domain (the [[kappa]] stance: a NULL label is
    * a missing label, not a verdict that can flip), and so are NULL
    * item/judge ids (the family's malformed-label-row domain — a NULL
    * judge id is not its own "judge" and a NULL item is not a
    * re-label cell; round-19 ADVICE alignment with [[kappa]] /
    * [[fleissKappa]]). Judges with no re-labeled items have no row
    * (no divide guard needed — the denominator is ≥ 1 by
    * construction).
    *
    * Plan shape: one scan → (item, judge) partial-agged exchange
    * (labels collapse to (count, min, max) — the label TEXT beyond the
    * verdict never moves) → judge-grain partial agg, metadata-sized.
    * No explode, no join.
    */
  def selfConsistency(df: DataFrame, item: String, judge: String,
                      verdict: String): DataFrame =
    df.where(col(verdict).isNotNull && col(item).isNotNull &&
        col(judge).isNotNull)
      .groupBy(col(item).as("__i"), col(judge).as("judge"))
      .agg(count(lit(1)).as("__n"), min(col(verdict)).as("__mn"),
        max(col(verdict)).as("__mx"))
      .where(col("__n") >= 2)
      .groupBy(col("judge"))
      .agg(count(lit(1)).as("n_relabeled"),
        sum(when(col("__mn") =!= col("__mx"), 1L).otherwise(0L))
          .as("n_flipped"))
      .withColumn("flip_milli",
        expr("CAST(n_flipped * 1000 div n_relabeled AS BIGINT)"))

  /** DuckDB twin of [[selfConsistency]]. */
  def selfConsistencySql(table: String, item: String, judge: String,
                         verdict: String): String =
    s"""SELECT judge, count(*) AS n_relabeled,
       |  sum(CASE WHEN mn <> mx THEN 1 ELSE 0 END)::BIGINT AS n_flipped,
       |  (sum(CASE WHEN mn <> mx THEN 1 ELSE 0 END) * 1000
       |    // count(*))::BIGINT AS flip_milli
       |FROM (
       |  SELECT $item AS i, $judge AS judge, count(*) AS n,
       |    min($verdict) AS mn, max($verdict) AS mx
       |  FROM $table WHERE $verdict IS NOT NULL
       |    AND $item IS NOT NULL AND $judge IS NOT NULL
       |  GROUP BY 1, 2)
       |WHERE n >= 2
       |GROUP BY judge""".stripMargin

  /** Shared WITH body for the BT twins: the directed pair CTE, then
    * one CTE per MM iteration (fixed count, mirrored arithmetic) up to
    * `w$iters`.
    */
  private def btCtes(table: String, a: String, b: String,
                     winner: String, iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      val prev = if (i == 1) "w0" else s"w${i - 1}"
      s"""w$i AS (
         |  SELECT d.m, any_value(s.hw_total) AS hw_total,
         |    (any_value(s.hw_total) * 1000000000 //
         |      greatest(sum(d.n_matches * 2000000000 // greatest(s.w + o.w, 1)), 1))::BIGINT AS w
         |  FROM directed d
         |  JOIN $prev s ON d.m = s.m
         |  JOIN $prev o ON d.opp = o.m
         |  GROUP BY d.m)""".stripMargin
    }.mkString(",\n")
    s"""pairs AS (
       |  SELECT lo, hi, count(*) AS n_matches, sum(hw) AS lo_halfwins
       |  FROM (
       |    SELECT least($a, $b) AS lo, greatest($a, $b) AS hi,
       |      CASE WHEN $winner = least($a, $b) THEN 2
       |           WHEN $winner = greatest($a, $b) THEN 0 ELSE 1 END AS hw
       |    FROM $table WHERE $a <> $b)
       |  GROUP BY lo, hi),
       |directed AS (
       |  SELECT lo AS m, hi AS opp, n_matches, lo_halfwins AS halfwins
       |  FROM pairs
       |  UNION ALL
       |  SELECT hi AS m, lo AS opp, n_matches,
       |    n_matches * 2 - lo_halfwins AS halfwins
       |  FROM pairs),
       |w0 AS (
       |  SELECT m, sum(halfwins) AS hw_total, 1000::BIGINT AS w
       |  FROM directed GROUP BY m),
       |$iterCtes""".stripMargin
  }

  /** DuckDB twin of [[btScores]]. */
  def btScoresSql(table: String, a: String, b: String,
                  winner: String, iters: Int = 3): String =
    s"""WITH ${btCtes(table, a, b, winner, iters)}
       |SELECT m AS model, w AS bt_milli FROM w$iters""".stripMargin

  /** DuckDB twin of [[btConvergence]]: the same CTE ladder, final
    * strengths joined to the previous iteration's.
    */
  def btConvergenceSql(table: String, a: String, b: String,
                       winner: String, iters: Int = 3): String = {
    require(iters >= 1, s"btConvergenceSql needs iters >= 1, got $iters")
    s"""WITH ${btCtes(table, a, b, winner, iters)}
       |SELECT wn.m AS model, wn.w AS bt_milli,
       |  (wn.w - wp.w)::BIGINT AS delta_milli,
       |  abs(wn.w - wp.w)::BIGINT AS abs_delta_milli
       |FROM w$iters wn JOIN w${iters - 1} wp ON wn.m = wp.m""".stripMargin
  }
}
