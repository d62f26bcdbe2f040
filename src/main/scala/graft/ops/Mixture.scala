package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-MIXTURE planning (round 18) — the sampling-weight stage of a
  * pretraining run: given the corpus's per-source token masses and a
  * target mixture (ABSOLUTE milli fractions of the final mix — a
  * source at 300 wants 30% of total tokens; weights should sum to
  * <= 1000 and are NOT renormalized, so scaling them all down scales
  * the whole plan down — the published-recipe shape of
  * Pile/LLaMA-style source tables), compute each source's sampling
  * factor in EPOCHS-MILLI (1000 = read the source once), capped at
  * `maxEpochMilli` so a small high-quality source is never repeated
  * past the memorization budget (the public multi-epoch guidance), and
  * report the mixture actually ACHIEVED after the caps bind — the gap
  * between `target_milli` and `achieved_milli` is the planner's
  * honest output, not an error.
  *
  * All arithmetic is non-negative integer milli (`div` ≡ `//`):
  * desired tokens = `target · T div 1000`, epochs =
  * `min(desired · 1000 div mass, maxEpochMilli)`, achieved =
  * `effective · 1000 div Σ effective`. A source absent from the
  * target table gets weight 0 — dropped from the mix but still a
  * REPORT ROW (its mass is visible, the quarantine never-drop
  * convention).
  *
  * Plan shape: ONE corpus scan into a |sources|-row partial-agged
  * exchange; everything after (the whole-frame total window, the
  * target CASE, the cap) runs on metadata-sized rows — the
  * unpartitioned windows here are over |sources| rows, not the corpus
  * (the "no SinglePartition window on corpus frames" rule does not
  * bind). Distributive first level — the episodeAgg streaming shape.
  */
object Mixture {

  private def targetCase(col: String, targets: Seq[(String, Int)]): String =
    if (targets.isEmpty) "CAST(0 AS BIGINT)"
    else targets.map { case (s, w) =>
      require(w >= 0, s"negative target weight for $s")
      require(!s.contains("'"), s"source name must not quote: $s")
      s"WHEN $col = '$s' THEN CAST($w AS BIGINT)"
    }.mkString("CASE ", " ", " ELSE CAST(0 AS BIGINT) END")

  /** Per-source sampling plan; `targets` are absolute milli fractions
    * of the final mix (the committed-constant pattern — one Scala
    * literal rendered into both dialects).
    */
  def mixPlan(df: DataFrame, text: String, source: String,
              targets: Seq[(String, Int)],
              maxEpochMilli: Int = 4000): DataFrame =
    graft.functions.VectorFunctions.attach(df)
      .groupBy(col(source).as("source"))
      .agg(sum(expr(s"graft_token_count($text)")).as("n_tokens"))
      .withColumn("__total", expr("sum(n_tokens) OVER ()"))
      .withColumn("target_milli", expr(targetCase("source", targets)))
      .withColumn("__desired", expr("target_milli * __total div 1000"))
      .withColumn("epochs_milli", expr(
        s"least(IF(n_tokens = 0, CAST(0 AS BIGINT), " +
          s"__desired * 1000 div n_tokens), CAST($maxEpochMilli AS BIGINT))"))
      .withColumn("effective_tokens", expr("n_tokens * epochs_milli div 1000"))
      .withColumn("achieved_milli", expr(
        "IF(sum(effective_tokens) OVER () = 0, CAST(0 AS BIGINT), " +
          "effective_tokens * 1000 div sum(effective_tokens) OVER ())"))
      .select(col("source"), col("n_tokens"), col("target_milli"),
        col("epochs_milli"), col("effective_tokens"), col("achieved_milli"))

  /** DuckDB twin of [[mixPlan]]. */
  def mixPlanSql(table: String, text: String, source: String,
                 targets: Seq[(String, Int)],
                 maxEpochMilli: Int = 4000): String =
    s"""SELECT source, n_tokens, target_milli, epochs_milli,
       |  effective_tokens,
       |  (CASE WHEN sum(effective_tokens) OVER () = 0 THEN 0
       |        ELSE effective_tokens * 1000
       |          // sum(effective_tokens) OVER () END)::BIGINT AS achieved_milli
       |FROM (
       |  SELECT source, n_tokens, target_milli, epochs_milli,
       |    (n_tokens * epochs_milli // 1000)::BIGINT AS effective_tokens
       |  FROM (
       |    SELECT source, n_tokens, target_milli,
       |      least(CASE WHEN n_tokens = 0 THEN 0
       |                 ELSE (target_milli * total // 1000) * 1000 // n_tokens END,
       |            $maxEpochMilli)::BIGINT AS epochs_milli
       |    FROM (
       |      SELECT source, n_tokens, sum(n_tokens) OVER () AS total,
       |        ${targetCase("source", targets)} AS target_milli
       |      FROM (
       |        SELECT $source AS source,
       |          sum(len(regexp_extract_all($text,
       |            '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')))::BIGINT AS n_tokens
       |        FROM $table GROUP BY 1))))""".stripMargin
}
