package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable distribution statistics: exact discrete percentiles,
  * fixed-width histograms, and z-score outliers. Each is engine-exact —
  * no `approx_percentile`/t-digest (whose sketch internals differ per
  * engine and run) and no order-dependent double accumulation:
  *
  *  - percentiles use the PERCENTILE_DISC definition (the value at rank
  *    `ceil(p * n)` in the group's total order) — rank selection, not
  *    interpolation, so the result is an actual data value and both
  *    engines pick the identical row;
  *  - histogram bins are pure `floor((v - lo) / width)` integer
  *    arithmetic on IEEE doubles (floor is exact; identical inputs ⇒
  *    identical bins);
  *  - moments come from exact DECIMAL sums (value and value² — decimal
  *    addition is associative, so parallel aggregation order cannot
  *    change the result), converted to double only for the final
  *    mean/variance arithmetic, which is then the same IEEE expression
  *    on both engines.
  */
object Stats {

  /** Exact per-group discrete percentiles. `tieCol` totalizes the sort
    * (duplicate values would otherwise make `row_number` engine-
    * dependent, though the SELECTED value would still agree; the tie
    * column makes the plans reproducible too). `valueCol` must be
    * non-null: the engines disagree on null sort position (Spark
    * NULLS FIRST vs DuckDB NULLS LAST by default) — filter nulls out
    * before ranking (same contract as every hash op in this library).
    *
    * Plan shape: ONE keyed exchange + ONE (value, tie) sort feeding both
    * windows (`row_number` and the partition count share the spec), then
    * a partial-aggregated groupBy on the same key — no second exchange.
    * Exact grouped percentiles require the per-group sort; that is the
    * honest cost (linear shuffle, per-reducer sort of its groups). At
    * 100 TB with heavy groups, pre-aggregate duplicates
    * ((group, value) → count and rank over running counts) or accept
    * sketch-approximation — this operator is the exact gate.
    */
  def percentilesDisc(df: DataFrame, groupCol: String, valueCol: String,
                      tieCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "percentiles must be in (0, 1]")
    val ordered = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    val whole = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(whole))
    val aggs = ps.map { p =>
      max(when(col("__rn") === ceil(lit(p) * col("__n")), col(valueCol)))
        .as(s"p${math.round(p * 100)}")
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** The SCALE formulation of [[percentilesDisc]] — identical results
    * (PERCENTILE_DISC picks the value at rank `ceil(p*n)`, and the
    * first value whose cumulative count reaches that rank IS that
    * value), but the per-group sort runs over DISTINCT (group, value)
    * rows instead of every row: the heavy groups that make the exact
    * gate expensive are exactly the ones with huge duplication factors
    * (counters, prices, grades), and the pre-aggregation shrinks them
    * by that factor before anything is sorted. No tie column — equal
    * values are one row here.
    *
    * Plan shape: one partial-aggregated (group, value) exchange (the
    * count combine happens map-side), one group-keyed exchange of the
    * REDUCED rows for the cumulative window, then the same partial-agg
    * rank selection. Two exchanges, but the second carries distinct
    * values only — at 5M events (≈49k distinct values) this measures
    * 0.9s vs the row-sort form's 4.7s (5.4×); the gap widens with the
    * duplication factor.
    */
  def percentilesDiscPreagg(df: DataFrame, groupCol: String, valueCol: String,
                            ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "percentiles must be in (0, 1]")
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(groupCol))
    val ranked = counts
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(whole))
    val aggs = ps.map { p =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col(valueCol)))
        .as(s"p${math.round(p * 100)}")
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB twin of [[percentilesDisc]] — same rank selection; `ceil`
    * over the same IEEE product picks the same rank.
    */
  def percentilesDiscSql(table: String, groupCol: String, valueCol: String,
                         tieCol: String, ps: Seq[Double]): String = {
    val sel = ps.map { p =>
      s"max(CASE WHEN rn = ceil($p * n) THEN $valueCol END) AS p${math.round(p * 100)}"
    }.mkString(",\n|  ")
    s"""WITH r AS (
       |  SELECT $groupCol, $valueCol,
       |    row_number() OVER (PARTITION BY $groupCol ORDER BY $valueCol, $tieCol) AS rn,
       |    count(*) OVER (PARTITION BY $groupCol) AS n
       |  FROM $table)
       |SELECT $groupCol,
       |  $sel
       |FROM r GROUP BY $groupCol""".stripMargin
  }

  /** Fixed-width histogram of `valueCol` over [lo, hi): `nBins` bins,
    * out-of-range values clamped into the edge bins (so the bin count is
    * exhaustive — a monitoring histogram must not silently drop rows).
    * One scan + one partial-aggregated exchange of ≤ nBins rows per map
    * task.
    */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    df.select(bin.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(lit(lo) + col("bin") * lit(width), 6))
      .withColumn("bin_hi", round(lit(lo) + (col("bin") + 1) * lit(width), 6))
  }

  /** DuckDB twin of [[histogram]] — identical clamp/floor arithmetic. */
  def histogramSql(table: String, valueCol: String,
                   lo: Double, hi: Double, nBins: Int): String = {
    val width = (hi - lo) / nBins
    s"""WITH b AS (
       |  SELECT CAST(least(greatest(floor(($valueCol - $lo) / $width), 0.0),
       |    ${(nBins - 1).toDouble}) AS BIGINT) AS bin
       |  FROM $table)
       |SELECT bin, count(*) AS n,
       |  round($lo + bin * $width, 6) AS bin_lo,
       |  round($lo + (bin + 1) * $width, 6) AS bin_hi
       |FROM b GROUP BY bin""".stripMargin
  }

  /** Distribution-DRIFT report (round 20) — the batch-over-batch
    * monitor every production ingest runs before trusting a new
    * snapshot: the [[histogram]] binning applied to BOTH sides of a
    * reference/current split, with per-bin counts, shares in milli,
    * and the absolute share delta — the total-variation distance is
    * `Σ abs_delta_milli div 2`, left to the consumer per the integer
    * convention (as is any log-weighted variant like PSI, which
    * needs float ln over these same exact counts).
    *
    * Sides: rows where `side = refValue` are the REFERENCE;
    * everything else (including a NULL side) is CURRENT — total, no
    * row silently dropped. NULL values land in their own `bin = -1`
    * (a monitoring histogram must not drop rows — the histogram
    * clamp convention extended to NULL), with NULL bin edges. An
    * empty side reports 0 shares with its zero total visible in the
    * counts (the ANSI div guard, both dialects).
    *
    * Plan shape: one scan into a ≤ (nBins+1)-row partial-agged bin
    * exchange; the share denominators are windowed totals over that
    * METADATA-sized frame (the mix_plan convention — a
    * SinglePartition window over ≤ 65 rows, never the corpus).
    * Distributive bin counts — complete-mode streamable up to the
    * window, batch the report.
    */
  def distDrift(df: DataFrame, side: String, value: String,
                refValue: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val width = (hi - lo) / nBins
    val bin = when(col(value).isNull, lit(-1L)).otherwise(
      least(greatest(floor((col(value) - lit(lo)) / lit(width)), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    df.select(bin.as("bin"),
      when(col(side) === lit(refValue), 1L).otherwise(0L).as("__r"))
      .groupBy(col("bin"))
      .agg(sum(col("__r")).as("n_ref"),
        sum(lit(1L) - col("__r")).as("n_cur"))
      .withColumn("__tr", sum(col("n_ref")).over(w))
      .withColumn("__tc", sum(col("n_cur")).over(w))
      .select(col("bin"),
        when(col("bin") === -1L, lit(null).cast("double"))
          .otherwise(round(lit(lo) + col("bin") * lit(width), 6)).as("bin_lo"),
        when(col("bin") === -1L, lit(null).cast("double"))
          .otherwise(round(lit(lo) + (col("bin") + 1) * lit(width), 6)).as("bin_hi"),
        col("n_ref"), col("n_cur"),
        expr("IF(__tr = 0, cast(0 AS BIGINT), " +
          "cast(n_ref * 1000 div __tr AS BIGINT))").as("share_ref_milli"),
        expr("IF(__tc = 0, cast(0 AS BIGINT), " +
          "cast(n_cur * 1000 div __tc AS BIGINT))").as("share_cur_milli"))
      .withColumn("abs_delta_milli",
        abs(col("share_ref_milli") - col("share_cur_milli")))
  }

  /** DuckDB twin of [[distDrift]] (identical clamp/floor arithmetic;
    * totals via unpartitioned windows over the bin rows).
    */
  def distDriftSql(table: String, side: String, value: String,
                   refValue: String, lo: Double, hi: Double,
                   nBins: Int): String = {
    val width = (hi - lo) / nBins
    s"""WITH b AS (
       |  SELECT CASE WHEN $value IS NULL THEN -1
       |         ELSE CAST(least(greatest(floor(($value - $lo) / $width), 0.0),
       |           ${(nBins - 1).toDouble}) AS BIGINT) END AS bin,
       |    CASE WHEN $side = '$refValue' THEN 1 ELSE 0 END AS r
       |  FROM $table),
       |g AS (
       |  SELECT bin, sum(r)::BIGINT AS n_ref,
       |    sum(1 - r)::BIGINT AS n_cur
       |  FROM b GROUP BY bin),
       |t AS (
       |  SELECT bin, n_ref, n_cur,
       |    sum(n_ref) OVER () AS tr, sum(n_cur) OVER () AS tc
       |  FROM g)
       |SELECT bin,
       |  CASE WHEN bin = -1 THEN NULL
       |       ELSE round($lo + bin * $width, 6) END AS bin_lo,
       |  CASE WHEN bin = -1 THEN NULL
       |       ELSE round($lo + (bin + 1) * $width, 6) END AS bin_hi,
       |  n_ref, n_cur,
       |  (CASE WHEN tr = 0 THEN 0 ELSE n_ref * 1000 // tr END)::BIGINT
       |    AS share_ref_milli,
       |  (CASE WHEN tc = 0 THEN 0 ELSE n_cur * 1000 // tc END)::BIGINT
       |    AS share_cur_milli,
       |  abs((CASE WHEN tr = 0 THEN 0 ELSE n_ref * 1000 // tr END)
       |    - (CASE WHEN tc = 0 THEN 0 ELSE n_cur * 1000 // tc END))::BIGINT
       |    AS abs_delta_milli
       |FROM t""".stripMargin
  }

  /** Per-group z-scores with population moments from EXACT decimal sums
    * (Σv as DECIMAL(28,2), Σv² as DECIMAL(38,4) — value² of a (18,2)
    * decimal has scale 4), so mean/variance are order-independent; the
    * final `(v - mean) / stddev` runs on identical doubles in both
    * engines. Rows whose |z| ≥ `threshold` are emitted — the per-group
    * anomaly gate. Groups with zero variance emit nothing (z undefined).
    *
    * Plan shape: one partial-aggregated moments pass (exchange of one
    * row per group), moments broadcast back onto a second scan, filter
    * before projection. Group cardinality is small by construction
    * (these are per-type/per-source gates); a high-cardinality group key
    * would make the broadcast a keyed shuffle — Catalyst's call either
    * way.
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double): DataFrame = {
    val moments = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      expr(s"cast(sum(cast($valueCol AS DECIMAL(18,2))) AS DOUBLE)").as("__s"),
      expr(s"cast(sum(cast($valueCol AS DECIMAL(18,2)) * cast($valueCol AS DECIMAL(18,2))) AS DOUBLE)")
        .as("__s2"))
      .withColumn("__mean", col("__s") / col("__n"))
      .withColumn("__var", col("__s2") / col("__n") - col("__mean") * col("__mean"))
      .where(col("__var") > 0.0)
      .select(col(groupCol), col("__mean"), sqrt(col("__var")).as("__sd"))
    df.join(broadcast(moments), Seq(groupCol))
      .withColumn("z", round((col(valueCol) - col("__mean")) / col("__sd"), 6))
      .where(abs(col("z")) >= threshold)
      .drop("__mean", "__sd")
  }

  /** DuckDB twin of [[zscoreOutliers]] — same decimal moments and the
    * same IEEE mean/variance/z arithmetic. Callers select/alias the
    * output columns (the Spark side keeps the input row intact).
    */
  def zscoreMomentsCte(table: String, groupCol: String, valueCol: String): String =
    s"""SELECT $groupCol,
       |  CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
       |  sqrt(CAST(sum(CAST($valueCol AS DECIMAL(18,2)) * CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*)
       |    - (CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*))
       |      * (CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*))) AS sd
       |FROM $table GROUP BY $groupCol
       |HAVING CAST(sum(CAST($valueCol AS DECIMAL(18,2)) * CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*)
       |  - (CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*))
       |    * (CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) / count(*)) > 0""".stripMargin

  /** HyperLogLog register sketch (Flajolet et al. 2007) over the
    * portable hash — the sketch-MERGEABLE distinct-count family the exact
    * `count(distinct)` path can't give at 100 TB: the whole sketch is
    * `groupBy(register).max(rho)`, a distributive partial aggregation, so
    * map-side combine collapses every partition to ≤ `m` rows before the
    * exchange, two sketches union by element-wise max, and a day's
    * sketch merges into a month's without rescanning either. Reference
    * scope: `typebus` has no sketch ops (its only "table" is keyed
    * entity state) — this is the training-pipeline extension mandate
    * (corpus-profile cardinalities: distinct URLs/domains/users per
    * shard, cheap enough to compute per partition of a 100 TB crawl).
    *
    * Register assignment uses the engine-portable md5 hash
    * ([[PortableHash]], values in `[0, P)`, `P < 2^30`): register
    * `h % m` (m = 2^p, `p` a parameter — default [[HllP]] = 6), rank
    * `rho` = leading-zero count of the remaining `30 − p`-bit budget
    * + 1 (`bin()`'s digit count gives the exact integer bit length in
    * both engines — no floats anywhere, so the sketch is
    * hash-identical cross-engine). `h div m < P/m < 2^(30−p)` exactly
    * bounds the budget; the slight non-uniformity of `[0, P)` vs
    * `[0, 2^30)` perturbs rank probabilities by < 7% at rho=1 — noise
    * below HLL's own `1.04/sqrt(m)` standard error (the
    * ESTIMATE is approximate BY DESIGN; the REGISTERS — the registered
    * output — are deterministic).
    *
    * Output: exactly m rows `(register, max_rho)`, absent registers as
    * `rho = 0` via an m-row spine join (broadcast — the agg side is
    * ≤ m rows post-combine).
    */
  def hllRegisters(df: DataFrame, valueExpr: String, p: Int = HllP): DataFrame = {
    val (m, w1) = hllShape(p)
    val agg = df
      .select(expr(PortableHash.sparkStringHash(valueExpr)).as("h"))
      .select((col("h") % m).as("register"),
        expr(s"IF(h div $m = 0, $w1, $w1 - length(bin(h div $m)))")
          .cast("int").as("rho"))
      .groupBy("register").agg(max(col("rho")).as("max_rho"))
    val spine = df.sparkSession.range(m).select(col("id").as("register"))
    spine.join(agg, Seq("register"), "left")
      .select(col("register"),
        coalesce(col("max_rho"), lit(0)).cast("int").as("max_rho"))
  }

  /** Default precision: the 30-bit portable-hash budget splits into
    * `p` register bits + `30 − p` rank bits. `p` is a parameter on all
    * sketch builders (m = 2^p registers, standard error 1.04/√m);
    * default 6 keeps the original 64-register shape.
    */
  val HllP = 6
  /** m at the default precision. */
  val HllM = 1 << HllP
  /** Rank-bit budget at the default precision: `h div 64 < 2^24`. */
  val HllW = 30 - HllP

  /** (m, max-rank) for precision p — rank `rho ∈ [1, 31−p]`; p is
    * bounded so at least one rank bit remains and registers stay
    * metadata-sized.
    */
  private[ops] def hllShape(p: Int): (Int, Int) = {
    require(p >= 4 && p <= 16, s"hll precision p must be in [4,16], got $p")
    (1 << p, 31 - p)
  }

  /** Integer milli-alpha for m = 2^p (Flajolet et al., Fig. 3) — an
    * INTEGER so `alphaMilli · m²` literals are exact in both engines
    * and the estimator's fixed-point arithmetic stays bit-identical.
    */
  private[ops] def hllAlphaMilli(p: Int): Long = p match {
    case 4 => 673L
    case 5 => 697L
    case 6 => 709L
    case _ => math.round(0.7213 / (1.0 + 1.079 / (1 << p)) * 1000.0)
  }

  /** DuckDB twin of [[hllRegisters]]. */
  def hllRegistersSql(table: String, valueExpr: String, p: Int = HllP): String = {
    val (m, w1) = hllShape(p)
    s"""WITH agg AS (
       |  SELECT h % $m AS register,
       |    CASE WHEN h // $m = 0 THEN $w1
       |         ELSE $w1 - length(bin(h // $m)) END AS rho
       |  FROM (SELECT ${PortableHash.duckStringHash(valueExpr)} AS h FROM $table)),
       |mx AS (SELECT register, max(rho) AS max_rho FROM agg GROUP BY register)
       |SELECT s.register::BIGINT AS register,
       |  coalesce(mx.max_rho, 0)::INT AS max_rho
       |FROM generate_series(0, ${m - 1}) AS s(register)
       |LEFT JOIN mx ON s.register = mx.register""".stripMargin
  }

  /** Classic HLL estimator over a `(register, max_rho)` sketch — the
    * spec-side consumer (raw estimate + linear-counting small-range
    * correction). Driver-side arithmetic over m integers; the
    * distributed work is all in [[hllRegisters]].
    */
  def hllEstimate(maxRho: Seq[Int], p: Int = HllP): Double = {
    val m = (1 << p).toDouble
    require(maxRho.size == (1 << p), s"expected ${1 << p} registers")
    val alpha = hllAlphaMilli(p) / 1000.0
    val raw = alpha * m * m / maxRho.map(r => math.pow(2.0, -r)).sum
    val zeros = maxRho.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  /** HLL accuracy gate — the distinct-count analog of
    * [[heavyHitters]]'s frequency gate and the ANN recall gates: exact
    * `count(distinct)` next to the sketch's raw estimate in ONE row
    * (per precision `p`; the registered query unions two precisions so
    * the board gates the error band at both), so the driver-checked
    * board carries the estimator's error per corpus, not just the
    * registers. Determinism discipline: Σ 2^−rho is held as the EXACT
    * integer Σ 2^((62−p)−rho) (rho ≤ 31−p by the rank budget, so terms
    * fit and 2^p of them stay under 2^63 — no clamp needed, no float
    * sum whose ordering could drift cross-engine);
    * the only floating step is the final α·m²·2^(62−p) / sum quotient —
    * exactly-representable operands through correctly-rounded IEEE
    * multiply/divide, bit-identical on both engines, rounded at 3.
    * `n_zero_registers` rides along so the linear-counting regime
    * (raw ≤ 2.5m — where the raw estimate is biased and the published
    * correction applies) is visible in the row; the gate deliberately
    * reports the RAW estimate (the log-free half) and leaves the
    * corrected estimator to [[hllEstimate]]/specs.
    */
  def hllAccuracy(df: DataFrame, valueExpr: String, p: Int = HllP): DataFrame = {
    val (m, _) = hllShape(p)
    val s = 62 - p                       // Σ 2^(s−rho): m·2^s ≤ 2^62, no overflow
    val numer = hllAlphaMilli(p) * m * m // exact integer αm²·1000
    val pow2s = 1L << s
    val exact = df.agg(
      countDistinct(expr(valueExpr)).as("n_exact"))
    hllRegisters(df, valueExpr, p)
      .agg(
        sum(expr(s"cast(1 AS BIGINT) * shiftleft(cast(1 AS BIGINT), $s - max_rho)"))
          .as("sum_scaled"),
        sum(when(col("max_rho") === 0, 1L).otherwise(0L)).as("n_zero_registers"))
      .crossJoin(broadcast(exact))
      .select(lit(p.toLong).as("p"), col("n_exact"), col("sum_scaled"),
        col("n_zero_registers"),
        round(lit(numer.toDouble) * lit(pow2s.toDouble) /
          col("sum_scaled") / lit(1000.0), 3).as("est_raw"))
  }

  /** DuckDB twin of [[hllAccuracy]]. */
  def hllAccuracySql(table: String, valueExpr: String, p: Int = HllP): String = {
    val (m, _) = hllShape(p)
    val s = 62 - p
    val numer = hllAlphaMilli(p) * m * m
    val pow2s = 1L << s
    s"""WITH regs AS (
       |${hllRegistersSql(table, valueExpr, p)}),
       |agg AS (
       |  SELECT sum(1::BIGINT << ($s - max_rho))::BIGINT AS sum_scaled,
       |    sum(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_registers
       |  FROM regs),
       |exact AS (SELECT count(DISTINCT $valueExpr)::BIGINT AS n_exact FROM $table)
       |SELECT ${p}::BIGINT AS p, e.n_exact, a.sum_scaled, a.n_zero_registers,
       |  round(${numer}e0 * ${pow2s}e0 / a.sum_scaled / 1000e0, 3) AS est_raw
       |FROM agg a, exact e""".stripMargin
  }

  /** Per-key HLL: one register sketch per group — "distinct users per
    * event_type over 100 TB" as a single keyed partial agg. Identical
    * register/rank arithmetic to [[hllRegisters]]; the exchange carries
    * ≤ `keys × 64` rows post-combine, and per-key sketches from
    * different days merge by element-wise max exactly like the global
    * one. Absent registers zero-fill via a per-key spine (distinct keys
    * × 64 — metadata-sized, derived from the same agg, no second corpus
    * scan).
    */
  def hllRegistersByKey(df: DataFrame, keyCol: String,
                        valueExpr: String): DataFrame = {
    val m = HllM
    val agg = Caches.lease(df
      .select(col(keyCol).as("key"),
        expr(PortableHash.sparkStringHash(valueExpr)).as("h"))
      .select(col("key"), (col("h") % m).as("register"),
        expr(s"IF(h div $m = 0, ${HllW + 1}, ${HllW + 1} - length(bin(h div $m)))")
          .cast("int").as("rho"))
      .groupBy("key", "register").agg(max(col("rho")).as("max_rho")))
    val spine = agg.select(col("key")).distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(m).select(col("id").as("register"))))
    spine.join(agg, Seq("key", "register"), "left")
      .select(col("key"), col("register"),
        coalesce(col("max_rho"), lit(0)).cast("int").as("max_rho"))
  }

  /** DuckDB twin of [[hllRegistersByKey]]. */
  def hllRegistersByKeySql(table: String, keyCol: String,
                           valueExpr: String): String = {
    val m = HllM
    s"""WITH agg AS (
       |  SELECT key, h % $m AS register,
       |    max(CASE WHEN h // $m = 0 THEN ${HllW + 1}
       |             ELSE ${HllW + 1} - length(bin(h // $m)) END) AS max_rho
       |  FROM (SELECT $keyCol AS key,
       |          ${PortableHash.duckStringHash(valueExpr)} AS h FROM $table)
       |  GROUP BY 1, 2),
       |spine AS (
       |  SELECT k.key, s.register
       |  FROM (SELECT DISTINCT key FROM agg) k,
       |       generate_series(0, ${m - 1}) AS s(register))
       |SELECT spine.key, spine.register::BIGINT AS register,
       |  coalesce(agg.max_rho, 0)::INT AS max_rho
       |FROM spine LEFT JOIN agg USING (key, register)""".stripMargin
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * FREQUENCY sketch next to HLL's distinct-count one: `d` universal
    * hash rows × `w` counters, point estimate = min over rows, always an
    * over-estimate, error ≤ N·e/w with probability 1 − e^−d. At 100 TB
    * the counters are the whole story: the sketch is one
    * `groupBy(row, col).count` distributive partial agg (≤ d·w rows per
    * partition pre-exchange — counters, never items), two sketches merge
    * by element-wise SUM (spec-pinned), so per-shard/day sketches fold
    * into corpus totals without rescanning, and heavy-hitter candidates
    * fall out of any counter ≥ threshold. All arithmetic is exact
    * integers over the portable hash (row i's column =
    * `universal(i, H(v)) % w` — [[PortableHash.universal]]'s constants
    * inlined with symbolic i), so the counters are deterministic
    * cross-engine. Output: exactly `d·w` rows `(row, col, n)`,
    * zero-filled via a broadcast spine.
    */
  def cmsCounters(df: DataFrame, valueExpr: String): DataFrame = {
    val (d, w, p) = (CmsD, CmsW, PortableHash.P)
    val agg = df
      .select(expr(PortableHash.sparkStringHash(valueExpr)).as("h"))
      .select(explode(expr(
        s"transform(sequence(0, ${d - 1}), i -> named_struct(" +
          s"'row', cast(i AS BIGINT), " +
          s"'col', (((37 + 61 * i) * h + (101 + 97 * i)) % $p) % $w))")).as("s"))
      .groupBy(col("s.row").as("row"), col("s.col").as("col"))
      .agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val spine = spark.range(d).select(col("id").as("row"))
      .crossJoin(spark.range(w).select(col("id").as("col")))
    spine.join(broadcast(agg), Seq("row", "col"), "left")
      .select(col("row"), col("col"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Depth (hash rows) and width (counters per row): ε = e/256 ≈ 1%,
    * δ = e^−4 ≈ 1.8%.
    */
  val CmsD = 4
  val CmsW = 256

  /** DuckDB twin of [[cmsCounters]]. */
  def cmsCountersSql(table: String, valueExpr: String): String = {
    val (d, w, p) = (CmsD, CmsW, PortableHash.P)
    s"""WITH agg AS (
       |  SELECT i::BIGINT AS row,
       |    (((37 + 61 * i) * h + (101 + 97 * i)) % $p) % $w AS col,
       |    count(*)::BIGINT AS n
       |  FROM (SELECT ${PortableHash.duckStringHash(valueExpr)} AS h FROM $table),
       |       (SELECT unnest(generate_series(0, ${d - 1})) AS i)
       |  GROUP BY 1, 2),
       |spine AS (
       |  SELECT r.row, c.col
       |  FROM generate_series(0, ${d - 1}) AS r(row),
       |       generate_series(0, ${w - 1}) AS c(col))
       |SELECT spine.row, spine.col, coalesce(agg.n, 0)::BIGINT AS n
       |FROM spine LEFT JOIN agg USING (row, col)""".stripMargin
  }

  /** Serve a sketch: estimate the CORPUS frequency of every distinct
    * value in a (small) batch from the corpus's count-min counters —
    * the mergeable-sketch serving pattern: yesterday's 100 TB crawl is
    * summarized once into d·w integers, and today's batch scores
    * against it with NO rescan of the corpus. Each batch value derives
    * its `d` (row, col) probe keys (same universal-hash arithmetic as
    * [[cmsCounters]]), joins the broadcast counter table, and takes
    * `min(n)` — the CMS point estimate, always ≥ the true corpus count.
    * Exchanges carry distinct batch values only; the counters are a
    * broadcast.
    */
  def cmsProbe(corpusCounters: DataFrame, batch: DataFrame,
               valueExpr: String): DataFrame = {
    val (d, w, p) = (CmsD, CmsW, PortableHash.P)
    batch
      .select(expr(valueExpr).as("value")).distinct()
      .select(col("value"),
        expr(PortableHash.sparkStringHash("value")).as("h"))
      .select(col("value"), explode(expr(
        s"transform(sequence(0, ${d - 1}), i -> named_struct(" +
          s"'row', cast(i AS BIGINT), " +
          s"'col', (((37 + 61 * i) * h + (101 + 97 * i)) % $p) % $w))")).as("s"))
      .select(col("value"), col("s.row").as("row"), col("s.col").as("col"))
      .join(broadcast(corpusCounters), Seq("row", "col"))
      .groupBy("value").agg(min(col("n")).as("est_freq"))
  }

  /** DuckDB twin of [[cmsProbe]] over [[cmsCountersSql]]'s counters. */
  def cmsProbeSql(corpusTable: String, batchTable: String,
                  valueExpr: String): String = {
    val (d, w, p) = (CmsD, CmsW, PortableHash.P)
    s"""WITH counters AS (${cmsCountersSql(corpusTable, valueExpr)}),
       |probes AS (
       |  SELECT value, i::BIGINT AS row,
       |    (((37 + 61 * i) * h + (101 + 97 * i)) % $p) % $w AS col
       |  FROM (SELECT DISTINCT $valueExpr AS value,
       |          ${PortableHash.duckStringHash(s"($valueExpr)")} AS h
       |        FROM $batchTable),
       |       (SELECT unnest(generate_series(0, ${d - 1})) AS i))
       |SELECT p.value, min(c.n)::BIGINT AS est_freq
       |FROM probes p JOIN counters c USING (row, col)
       |GROUP BY 1""".stripMargin
  }

  /** Point-frequency estimate from a collected sketch: min over the `d`
    * counters the value hashes to (always ≥ the true count). Driver-side
    * arithmetic over d·w integers; the distributed work is all in
    * [[cmsCounters]].
    */
  def cmsEstimate(counters: Map[(Long, Long), Long], value: String): Long = {
    val h = PortableHash.jvmStringHash(value)
    (0 until CmsD).map { i =>
      val c = ((37L + 61L * i) * h + (101L + 97L * i)) % PortableHash.P % CmsW
      counters((i.toLong, c))
    }.min
  }

  /** Heavy hitters with sketch accuracy in-row: exact top-`k` values by
    * frequency (TakeOrdered over the keyed count agg — never a global
    * sort) joined with their CMS point estimates, emitting
    * `(value, true_freq, est_freq, overcount)` — the frequency-sketch
    * family's accuracy gate, the analog of the ANN families' recall@k
    * queries. CMS guarantees `est_freq ≥ true_freq` with
    * `overcount ≤ N·e/w` at probability `1 − e^−d`; a row violating the
    * lower bound means a broken sketch, and the overcount column makes
    * the ε-band auditable per value.
    *
    * Scale shape: the exact side is one keyed partial-agg exchange +
    * TakeOrdered(k); the sketch side is [[cmsCounters]]'s d·w-row
    * counter table; the probe joins only the k winners against the
    * broadcast counters. At 100 TB the exact side is the one linear
    * scan you are already paying for the count — the sketch's value is
    * that TOMORROW's batches probe yesterday's d·w integers with no
    * rescan ([[cmsProbe]]), and this query is the standing proof the
    * estimates stay inside their band.
    */
  def heavyHitters(df: DataFrame, valueExpr: String, k: Int): DataFrame = {
    val exact = df.select(expr(valueExpr).as("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("true_freq"))
      .orderBy(col("true_freq").desc, col("value").asc).limit(k)
    cmsProbe(cmsCounters(df, valueExpr), exact, "value")
      .join(broadcast(exact), Seq("value"))
      .select(col("value"), col("true_freq"), col("est_freq"),
        (col("est_freq") - col("true_freq")).as("overcount"))
  }

  /** DuckDB twin of [[heavyHitters]]. */
  def heavyHittersSql(table: String, valueExpr: String, k: Int): String = {
    val (d, w, p) = (CmsD, CmsW, PortableHash.P)
    s"""WITH counters AS (${cmsCountersSql(table, valueExpr)}),
       |exact AS (
       |  SELECT $valueExpr AS value, count(*)::BIGINT AS true_freq
       |  FROM $table GROUP BY 1
       |  ORDER BY true_freq DESC, value ASC LIMIT $k),
       |probes AS (
       |  SELECT value, i::BIGINT AS row,
       |    (((37 + 61 * i) * h + (101 + 97 * i)) % $p) % $w AS col
       |  FROM (SELECT value, ${PortableHash.duckStringHash("value")} AS h
       |        FROM exact),
       |       (SELECT unnest(generate_series(0, ${d - 1})) AS i)),
       |est AS (
       |  SELECT p.value, min(c.n)::BIGINT AS est_freq
       |  FROM probes p JOIN counters c USING (row, col)
       |  GROUP BY 1)
       |SELECT e.value, e.true_freq, est.est_freq,
       |  (est.est_freq - e.true_freq)::BIGINT AS overcount
       |FROM exact e JOIN est USING (value)""".stripMargin
  }

  /** Log-bucketed quantile sketch — the mergeable QUANTILE rung of the
    * sketch family (HLL = distinct, CMS = frequency): values land in
    * power-of-two magnitude buckets (HDR-histogram shape), so the sketch
    * is one `groupBy(bucket).agg(count, sum)` distributive partial agg
    * (≤ ~128 rows per partition pre-exchange), two sketches merge by
    * per-bucket element-wise sum, and any quantile reads off the
    * cumulative bucket counts with relative error bounded by the bucket
    * ratio (2×) — vs `percentilesDisc`'s exact-but-sort-heavy path, this
    * is what you keep ALWAYS-ON per shard of a 100 TB stream and fold
    * into fleet-wide latency/size percentiles without rescans.
    *
    * Determinism: values go through DECIMAL(18,2) fixed-point
    * (`v100 = value·100` as BIGINT — exact in both engines, the
    * [[percentilesDisc]] discipline), bucket = signed bit length of v100
    * (`length(bin(·))` = exact integer bit length cross-engine, negative
    * magnitudes mirrored to negative bucket ids so ascending bucket id =
    * ascending value). Counts and per-bucket v100 sums are exact
    * integers — the sketch hashes identically cross-engine; only the
    * spec-side estimator approximates.
    */
  def logQuantileSketch(df: DataFrame, valueCol: String): DataFrame =
    df.select(expr(s"cast(cast($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("v100"))
      .select(expr(
        "cast(IF(v100 = 0, 0, IF(v100 > 0, length(bin(v100)), -length(bin(-v100)))) AS INT)")
        .as("bucket"), col("v100"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("v100")).as("sum100"))

  /** DuckDB twin of [[logQuantileSketch]]. */
  def logQuantileSketchSql(table: String, valueCol: String): String =
    s"""SELECT CASE WHEN v100 = 0 THEN 0
       |            WHEN v100 > 0 THEN length(bin(v100))
       |            ELSE -length(bin(-v100)) END::INT AS bucket,
       |  count(*)::BIGINT AS n, sum(v100)::BIGINT AS sum100
       |FROM (SELECT (($valueCol)::DECIMAL(18,2) * 100)::BIGINT AS v100
       |      FROM $table)
       |GROUP BY 1""".stripMargin

  /** Quantile-sketch accuracy gate — completes the sketch family's gate
    * symmetry (HLL → [[hllAccuracy]], CMS → [[heavyHitters]]): one row
    * holding, per percentile, the EXACT rank-selected value (the
    * [[percentilesDiscPreagg]] formulation over distinct fixed-point
    * values) next to the SKETCH's estimate (first log-bucket whose
    * cumulative count reaches rank `ceil(p·n)`, answered as the
    * bucket's truncated integer mean), both in v100 fixed-point units —
    * the 2× bucket band is auditable per corpus on the driver-checked
    * board. All arithmetic exact integers except the shared
    * correctly-rounded `ceil(p·n)` rank product (the
    * [[percentilesDisc]] precedent). The sketch-side window is a
    * single-partition sort over ≤ ~128 bucket rows — metadata-sized by
    * construction, the documented exception.
    */
  def quantileAccuracy(df: DataFrame, valueCol: String,
                       ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame = {
    def tag(p: Double) = math.round(p * 100)
    val v100 = df.select(
      expr(s"cast(cast($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v100"),
      lit(1).as("g"))
    val exact = percentilesDiscPreagg(v100, "g", "v100", ps)
      .select(ps.map(p => col(s"p${tag(p)}").as(s"exact_p${tag(p)}")): _*)
    val cumW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
    val ranked = logQuantileSketch(df, valueCol)
      .withColumn("__cum", sum(col("n")).over(cumW))
      .withColumn("__tot", sum(col("n")).over(whole))
    val estAggs = ps.map { p =>
      min(when(col("__cum") >= ceil(lit(p) * col("__tot")),
        expr("sum100 div n"))).as(s"est_p${tag(p)}")
    }
    ranked.agg(estAggs.head, estAggs.tail: _*)
      .crossJoin(broadcast(exact))
  }

  /** DuckDB twin of [[quantileAccuracy]]. */
  def quantileAccuracySql(table: String, valueCol: String,
                          ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): String = {
    def tag(p: Double) = math.round(p * 100)
    val exactSel = ps.map(p =>
      s"min(CASE WHEN cum >= ceil($p * n) THEN v100 END) AS exact_p${tag(p)}")
      .mkString(", ")
    val estSel = ps.map(p =>
      s"min(CASE WHEN cum >= ceil($p * tot) THEN sum100 // n END) AS est_p${tag(p)}")
      .mkString(", ")
    s"""WITH v AS (SELECT (($valueCol)::DECIMAL(18,2) * 100)::BIGINT AS v100 FROM $table),
       |counts AS (SELECT v100, count(*)::BIGINT AS c FROM v GROUP BY 1),
       |r AS (
       |  SELECT v100,
       |    sum(c) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(c) OVER () AS n
       |  FROM counts),
       |exact AS (SELECT $exactSel FROM r),
       |sk AS (
       |${logQuantileSketchSql(table, valueCol)}),
       |skr AS (
       |  SELECT bucket, n, sum100,
       |    sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(n) OVER () AS tot
       |  FROM sk),
       |est AS (SELECT $estSel FROM skr)
       |SELECT est.*, exact.* FROM est, exact""".stripMargin
  }

  /** Quantile estimate from a collected sketch: rank-select the bucket
    * by cumulative count (PERCENTILE_DISC's rank rule), answer the
    * bucket's mean value — within the bucket's 2× relative-error band of
    * the true quantile. Driver-side arithmetic over ≤ ~128 rows.
    */
  def logQuantileEstimate(buckets: Seq[(Int, Long, Long)], p: Double): Double = {
    require(buckets.nonEmpty, "empty sketch")
    val sorted = buckets.sortBy(_._1)
    val n = sorted.map(_._2).sum
    val rank = math.max(1L, math.ceil(p * n).toLong)
    var cum = 0L
    val hit = sorted.find { case (_, bn, _) => cum += bn; cum >= rank }.get
    hit._3.toDouble / hit._2 / 100.0
  }
}
